"""CPU smoke of bench.py's family block — the code path that produces
the round artifact's ``family`` rows must not rot between (rare) real
TPU runs.  tiny=True shrinks shapes; the probe structure (preset →
build_model → init → jitted apply/train-step → timed loop → rows dict)
is exactly the shipped one."""
import importlib
import os
import sys

import pytest


@pytest.mark.slow
def test_family_rows_tiny_smoke(monkeypatch):
    monkeypatch.setenv("TRANSCAR_BENCH_FAMILY", "1")
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    bench = importlib.import_module("bench")
    rows = bench._family_rows(tiny=True)
    assert set(rows) == {"vovnet_bs1_infer", "vovnet_bs4_infer",
                         "pillar_bs1_infer", "pillar_bs2_infer",
                         "voxel_bs1_infer", "voxel_bs2_infer",
                         "pillar_bs1_train", "voxel_bs1_train"}
    bad = {k: v for k, v in rows.items() if not isinstance(v, float)}
    assert not bad, f"family probes broke: {bad}"
    assert all(v > 0 for v in rows.values())


def test_family_rows_opt_out(monkeypatch):
    monkeypatch.setenv("TRANSCAR_BENCH_FAMILY", "0")
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    bench = importlib.import_module("bench")
    assert bench._family_rows(tiny=True) == {}
