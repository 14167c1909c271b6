"""Scalar ``@arrow_udf`` kernels (Spark 4.1 Arrow-native scalar UDFs).

This module intentionally does NOT use ``from __future__ import
annotations``: arrow_udf dispatches on the *evaluated* pyarrow type
annotations of the kernel signature, and the future import would turn them
into strings (UNSUPPORTED_SIGNATURE).
"""

import pyarrow as pa
import pyarrow.compute as pc
from pyspark.sql.functions import arrow_udf


@arrow_udf("long")
def to_cents(v: pa.Array) -> pa.Array:
    """Quantize a 2-decimal double column to exact integer cents.

    ×100 → round (half_towards_infinity = away from zero, pyarrow 16's
    name for it) → int64. The inputs carry two decimals, so the nearest
    integer of the ×100 product is the true cents value — the same integer
    a DECIMAL(18,2) cast produces in Spark or DuckDB."""
    return pc.cast(
        pc.round(
            pc.multiply(v, pa.scalar(100.0)),
            ndigits=0,
            round_mode="half_towards_infinity",
        ),
        pa.int64(),
    )
