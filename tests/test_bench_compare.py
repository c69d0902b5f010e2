"""scripts/bench_compare.py — the replayable cross-round ratio.

COVERAGE.md's cross-round claims now cite this computation, so its
subset rules (drop names whose rider_free arm changed between files)
and calibration normalization are pinned here against hand-computable
fixtures, including the driver's BENCH_r*.json `tail` wrapper.
"""

from __future__ import annotations

import importlib.util
import json
from pathlib import Path

_spec = importlib.util.spec_from_file_location(
    "bench_compare",
    Path(__file__).resolve().parent.parent / "scripts" / "bench_compare.py",
)
bc = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bc)


def test_rider_free_changed_names_are_excluded():
    new = {
        "queries": {"a": 2.0, "b": 1.0, "c": 5.0},
        "rider_free": ["c"],  # c switched arms -> excluded
    }
    old = {"queries": {"a": 1.0, "b": 1.0, "c": 10.0}}
    r = bc.compare(new, old)
    assert r["excluded_methodology_changed"] == ["c"]
    assert r["subset"] == ["a", "b"]
    assert r["sum_ratio"] == 1.5  # (2+1)/(1+1)
    assert r["median_ratio"] == 1.5  # median of {2.0, 1.0}
    assert "host_speed_ratio" not in r  # no calibration in either file


def test_same_rider_free_set_is_comparable():
    new = {"queries": {"a": 1.0}, "rider_free": ["a"]}
    old = {"queries": {"a": 2.0}, "rider_free": ["a"]}
    r = bc.compare(new, old)
    assert r["subset"] == ["a"] and r["sum_ratio"] == 0.5


def test_calibration_normalization():
    new = {"queries": {"a": 3.0}, "calibration_sec": 1.5}
    old = {"queries": {"a": 2.0}, "calibration_sec": 1.0}
    r = bc.compare(new, old)
    assert r["sum_ratio"] == 1.5
    assert r["host_speed_ratio"] == 1.5
    # the host got 1.5x slower and the query 1.5x slower -> normalized flat
    assert r["sum_ratio_host_normalized"] == 1.0


def test_loads_driver_tail_wrapper(tmp_path):
    inner = {"metric": "m", "queries": {"a": 1.0}, "rider_free": None}
    wrapped = {"n": 8, "tail": "noise line\n" + json.dumps(inner) + "\n"}
    p = tmp_path / "BENCH_rX.json"
    p.write_text(json.dumps(wrapped))
    assert bc.load(str(p))["queries"] == {"a": 1.0}
    # raw bench.py output loads too
    q = tmp_path / "raw.json"
    q.write_text(json.dumps(inner))
    assert bc.load(str(q))["queries"] == {"a": 1.0}
