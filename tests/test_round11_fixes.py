"""Round-11 regression tests for the ADVICE r10 items.

1. The incremental near-dup state swap is crash-safe in BOTH rename
   windows (old-aside-then-new-in), and a missing state after a committed
   batch fails LOUDLY instead of silently restarting empty.
2. tools/replica.py turns invalid --start/--window into the clean exit-2
   error path instead of an uncaught ValueError traceback.
"""
from __future__ import annotations

import subprocess
import sys
from pathlib import Path

import pytest

from breweries_data_engineering_case_spark.plans.q_docs import (
    publish_incremental_state,
    recover_incremental_state,
)


def _committed(d: Path, tag: str) -> None:
    d.mkdir(parents=True, exist_ok=True)
    (d / "_SUCCESS").touch()
    (d / "part-0.parquet").write_text(tag)


def _tag(d: Path) -> str:
    return (d / "part-0.parquet").read_text()


class TestIncrementalStateSwap:
    def test_fresh_store_resolves_to_none(self, tmp_path):
        assert recover_incremental_state(tmp_path) is None

    def test_publish_then_recover_roundtrip(self, tmp_path):
        new = tmp_path / "state_e0"
        _committed(new, "epoch0")
        publish_incremental_state(tmp_path, new)
        got = recover_incremental_state(tmp_path)
        assert got == tmp_path / "state" and _tag(got) == "epoch0"
        # second epoch replaces the first and leaves no aside copy behind
        new2 = tmp_path / "state_e1"
        _committed(new2, "epoch1")
        publish_incremental_state(tmp_path, new2)
        assert _tag(recover_incremental_state(tmp_path)) == "epoch1"
        assert not (tmp_path / "state_prev").exists()

    def test_crash_between_renames_recovers_from_aside(self, tmp_path):
        # simulate: publish moved state -> state_prev, then died before
        # moving the new dir in (the exact window ADVICE r10 flagged)
        _committed(tmp_path / "state_prev", "epoch0")
        (tmp_path / "state_initialized").touch()
        got = recover_incremental_state(tmp_path)
        assert got == tmp_path / "state" and _tag(got) == "epoch0"

    def test_crash_after_new_in_prefers_state_over_stale_prev(self, tmp_path):
        # simulate: new dir renamed in, crash before the aside cleanup
        _committed(tmp_path / "state", "epoch1")
        _committed(tmp_path / "state_prev", "epoch0")
        (tmp_path / "state_initialized").touch()
        assert _tag(recover_incremental_state(tmp_path)) == "epoch1"

    def test_missing_state_after_commit_fails_loudly(self, tmp_path):
        # a prior batch committed (marker present) but neither state nor
        # state_prev is readable: an empty-state restart would emit
        # quietly-wrong candidates, so this must raise
        (tmp_path / "state_initialized").touch()
        with pytest.raises(RuntimeError, match="refusing to continue"):
            recover_incremental_state(tmp_path)

    def test_uncommitted_state_dir_is_not_readable(self, tmp_path):
        # a state dir without _SUCCESS (torn write) on a fresh store
        # resolves to None, not to the torn dir
        (tmp_path / "state").mkdir()
        (tmp_path / "state" / "part-0.parquet").write_text("torn")
        assert recover_incremental_state(tmp_path) is None


class TestReplicaInvalidArgs:
    @pytest.mark.parametrize(
        "argv",
        [["--start", "-1"], ["--window", "0"], ["--window", "-5"]],
    )
    def test_invalid_args_exit_2_without_traceback(self, argv):
        proc = subprocess.run(
            [sys.executable, "tools/replica.py", *argv],
            capture_output=True,
            text=True,
            cwd=str(Path(__file__).resolve().parents[1]),
            timeout=120,
        )
        assert proc.returncode == 2
        assert "ERROR:" in proc.stdout
        assert "Traceback" not in proc.stderr
