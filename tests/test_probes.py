"""Suite wrappers for the r11 auditable probe tools: exact-boundary
time semantics and zero-row robustness are permanent invariants, not
one-round evidence — a regression in either must turn the suite red."""

from __future__ import annotations

import os
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_time_boundaries_agree_with_oracles(spark):
    # in-process: the tool getOrCreate()s (and never stops) the shared
    # session, and none of its target queries use the xcheck channel, so
    # import-time oracle paths don't matter
    from tools.probe_time_boundaries import main

    assert main() == 0


def test_all_gated_queries_run_on_empty_tables():
    # SUBPROCESS on purpose: the tool must set SCORE_SPARK_ORACLE_SF_DIR
    # BEFORE __spark_entry__ imports (xcheck oracle strings embed their
    # channel path at import time) — inside a shared pytest interpreter
    # the entry module may already be cached with the default path
    r = subprocess.run(
        [sys.executable, os.path.join(_REPO, "tools", "probe_degenerate_inputs.py")],
        capture_output=True, text=True, cwd=_REPO, timeout=540,
    )
    tail = (r.stdout + r.stderr)[-2000:]
    assert r.returncode == 0, tail
