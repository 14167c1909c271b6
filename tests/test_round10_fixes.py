"""Round-10 hardening regression tests (VERDICT r9 tasks)."""
from __future__ import annotations

import subprocess
import sys

import pytest

sys.path.insert(0, ".")
from tools.replica import select_window  # noqa: E402

NAMES = [f"q{i}" for i in range(10)]


class TestReplicaWindowSlicer:
    """VERDICT r9 #2: --window is a chunk size relative to --start."""

    def test_chunks_tile_the_registry_without_gaps_or_overlap(self):
        chunks = [select_window(NAMES, s, 3) for s in range(0, 10, 3)]
        assert [c for ch in chunks for c in ch] == NAMES

    def test_start_equals_window_runs_the_second_chunk(self):
        # the historical footgun: --start 65 --window 65 ran NOTHING
        assert select_window(NAMES, 5, 5) == NAMES[5:10]

    def test_no_window_resumes_to_end(self):
        assert select_window(NAMES, 7, None) == NAMES[7:]

    def test_window_past_end_clips(self):
        assert select_window(NAMES, 8, 100) == NAMES[8:]

    def test_invalid_args_raise(self):
        with pytest.raises(ValueError):
            select_window(NAMES, -1, 5)
        with pytest.raises(ValueError):
            select_window(NAMES, 0, 0)

    def test_empty_selection_exits_nonzero(self):
        # end-to-end: a start past the registry must fail loudly, not
        # masquerade as a green sweep
        proc = subprocess.run(
            [sys.executable, "tools/replica.py", "--start", "999999", "--window", "5"],
            capture_output=True,
            text=True,
            timeout=600,
            cwd=".",
        )
        assert proc.returncode == 2, proc.stdout + proc.stderr
        assert "selection is empty" in proc.stdout
