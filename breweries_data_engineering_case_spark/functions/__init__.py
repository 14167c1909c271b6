"""Column-level expression helpers (all JVM-side, codegen-friendly)."""

from .cleaning import clean_str, nullif_blank, stamp_date, try_double

__all__ = ["clean_str", "nullif_blank", "stamp_date", "try_double"]
