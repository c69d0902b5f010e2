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


# --- r09: summary-line size budget + sidecar resolution --------------------
#
# The r08 driver artifact (BENCH_r08.json, committed) captured only the
# LAST 2000 chars of bench.py's stdout and the all-in-one JSON line
# outgrew that — `parsed: null`. bench.py now prints a size-budgeted
# summary and writes the full map to a sidecar; these tests pin that
# contract end-to-end, including the driver's exact tail-capture
# behavior, so a future line-growth regression fails CI instead of
# surfacing in the driver artifact.

_bench_spec = importlib.util.spec_from_file_location(
    "bench", Path(__file__).resolve().parent.parent / "bench.py"
)
bench = importlib.util.module_from_spec(_bench_spec)
_bench_spec.loader.exec_module(bench)

DRIVER_TAIL_CHARS = 2000  # measured from BENCH_r08.json's `tail` field


def _worst_case_payloads(n_queries: int = 400):
    # names at the registry's realistic worst (the longest registered
    # name today is 29 chars; pad to 40 for safety margin)
    timings = {f"ns_worst_case_query_name_padding_{i:04d}": 123.456 for i in range(n_queries)}
    worst = {k: 4.52 for k in timings}
    return bench.build_payloads(
        timings,
        sf=0.1,
        repeat=3,
        calibration=1.288,
        calibration_io=12.345,
        repeats={k: 5 for k in timings},
        cc_rounds={k: [17, 23] for k in list(timings)[:20]},
        rider_free=sorted(timings)[:200],
        worst_ratio=worst,
        detail_file="BENCH_DETAIL_r99.json",
    )


def test_summary_line_fits_driver_tail_budget():
    detail, summary = _worst_case_payloads()
    line = json.dumps(summary)
    assert len(line.encode()) <= bench.SUMMARY_BYTE_BUDGET <= DRIVER_TAIL_CHARS - 400
    # the detail sidecar keeps the full record
    assert len(detail["queries"]) == 400
    assert detail["rider_free"] and detail["cc_rounds"]
    assert summary["n_queries"] == 400
    assert len(summary["queries_top"]) == bench.TOP_N


def test_driver_tail_capture_roundtrip(tmp_path):
    """Simulate the driver verbatim: keep the last 2000 chars of stdout,
    wrap them, and require bench_compare to recover the FULL map."""
    detail, summary = _worst_case_payloads()
    stdout = "some warmup noise\n" + json.dumps(summary) + "\n"
    wrapped = {"n": 8, "rc": 0, "tail": stdout[-DRIVER_TAIL_CHARS:]}
    p = tmp_path / "BENCH_r99.json"
    p.write_text(json.dumps(wrapped))
    # the line must have survived the tail cut intact
    assert '{"metric"' in wrapped["tail"]
    (tmp_path / "BENCH_DETAIL_r99.json").write_text(json.dumps(detail))
    loaded = bc.load(str(p))
    assert loaded["queries"] == detail["queries"]
    # the full record carries the r10 additions: per-query run counts
    # and the I/O-phase calibration
    assert loaded["repeats"] and set(loaded["repeats"]) == set(detail["queries"])
    assert loaded["calibration_io_sec"] == 12.345


def test_stale_sidecar_is_rejected(tmp_path):
    detail, summary = _worst_case_payloads()
    stale = dict(detail, value=0.001)  # totals disagree -> different run
    p = tmp_path / "BENCH_r99.json"
    p.write_text(json.dumps({"tail": json.dumps(summary) + "\n"}))
    (tmp_path / "BENCH_DETAIL_r99.json").write_text(json.dumps(stale))
    import pytest

    with pytest.raises(SystemExit, match="no candidate"):
        bc.load(str(p))


def test_tail_truncated_at_end_falls_back_to_snapshot(tmp_path):
    """r09 ADVICE: a tail line that keeps its '{"metric"' head but is
    cut at the END must fall through to the round-stamped snapshot
    (the fallback added for r08's head-truncation), not crash load()
    with an uncaught JSONDecodeError."""
    detail, summary = _worst_case_payloads()
    truncated = json.dumps(summary)[:-40]  # lose the tail, keep the head
    p = tmp_path / "BENCH_r99.json"
    p.write_text(json.dumps({"tail": "noise\n" + truncated}))
    (tmp_path / "BENCH_DETAIL_r99.json").write_text(json.dumps(detail))
    assert bc.load(str(p))["queries"] == detail["queries"]


def test_truncated_tail_rejects_mismatched_snapshot(tmp_path):
    """The end-truncation fallback must keep the stale-sidecar guard:
    the summary's key order puts `value` near the head, so a truncated
    line usually still carries it — a snapshot whose totals disagree
    with the surviving fragment is a DIFFERENT run and must be
    rejected, not silently paired (r10 review finding)."""
    detail, summary = _worst_case_payloads()
    stale = dict(detail, value=0.001)
    truncated = json.dumps(summary)[:-40]
    p = tmp_path / "BENCH_r99.json"
    p.write_text(json.dumps({"tail": "noise\n" + truncated}))
    (tmp_path / "BENCH_DETAIL_r99.json").write_text(json.dumps(stale))
    import pytest

    with pytest.raises(SystemExit, match="different run"):
        bc.load(str(p))


def test_truncated_tail_rejects_snapshot_missing_value(tmp_path):
    """r10 ADVICE: a snapshot that LACKS the compared field entirely
    (detail.get returns None) while the truncated fragment carries one
    must produce the clean SystemExit diagnostic, not a TypeError from
    float(None)."""
    detail, summary = _worst_case_payloads()
    fieldless = {k: v for k, v in detail.items() if k != "value"}
    truncated = json.dumps(summary)[:-40]
    p = tmp_path / "BENCH_r99.json"
    p.write_text(json.dumps({"tail": "noise\n" + truncated}))
    (tmp_path / "BENCH_DETAIL_r99.json").write_text(json.dumps(fieldless))
    import pytest

    with pytest.raises(SystemExit, match="different run"):
        bc.load(str(p))


def test_round_stamp_reads_committed_not_working_tree(tmp_path):
    """r10 ADVICE: in a git checkout the stamp comes from `git
    ls-files`, so the driver's in-flight, not-yet-committed
    BENCH_r{N}.json must NOT bump the stamp to r{N+1}."""
    import subprocess

    subprocess.run(["git", "init", "-q", str(tmp_path)], check=True)
    (tmp_path / "BENCH_r09.json").write_text("{}")
    subprocess.run(
        ["git", "-C", str(tmp_path), "add", "BENCH_r09.json"], check=True
    )
    subprocess.run(
        [
            "git",
            "-C",
            str(tmp_path),
            "-c",
            "user.email=t@t",
            "-c",
            "user.name=t",
            "commit",
            "-qm",
            "r09",
        ],
        check=True,
    )
    # the driver writes r10 mid-round without committing it
    (tmp_path / "BENCH_r10.json").write_text("{}")
    assert bench.infer_round_stamp(tmp_path) == "r10"  # not r11
    # ...even STAGED (the index is not a commit; r11 review)
    subprocess.run(
        ["git", "-C", str(tmp_path), "add", "BENCH_r10.json"], check=True
    )
    assert bench.infer_round_stamp(tmp_path) == "r10"  # still not r11
    # a root that merely sits INSIDE a repo (not its toplevel) must use
    # the working-tree glob, not the enclosing repo's empty listing
    sub = tmp_path / "scratch"
    sub.mkdir()
    (sub / "BENCH_r05.json").write_text("{}")
    assert bench.infer_round_stamp(sub) == "r06"


def test_detail_name_counter_suffix_unique_within_second(tmp_path):
    """r10 ADVICE: two full runs resolving names in the same second must
    land in distinct files — the suffix is a counter, not a clock."""
    (tmp_path / "BENCH_r09.json").write_text("{}")
    (tmp_path / "BENCH_DETAIL_r10.json").write_text("{}")
    first = bench.resolve_detail_name(False, tmp_path)
    assert first == "BENCH_DETAIL_r10_2.json"
    (tmp_path / first).write_text("{}")
    assert bench.resolve_detail_name(False, tmp_path) == "BENCH_DETAIL_r10_3.json"


def test_io_calibration_normalization():
    """r10: both files carrying calibration_io_sec get an I/O-normalized
    view alongside the CPU one (the two calibrations can drift
    independently — r09's slow phases were I/O-only)."""
    new = {"queries": {"a": 4.0}, "calibration_sec": 1.0, "calibration_io_sec": 4.0}
    old = {"queries": {"a": 2.0}, "calibration_sec": 1.0, "calibration_io_sec": 2.0}
    r = bc.compare(new, old)
    assert r["sum_ratio"] == 2.0
    assert r["host_speed_ratio"] == 1.0 and r["sum_ratio_host_normalized"] == 2.0
    assert r["host_io_ratio"] == 2.0 and r["sum_ratio_io_normalized"] == 1.0
    # absent in either file -> no I/O keys (pre-r10 files stay loadable)
    r2 = bc.compare({"queries": {"a": 1.0}}, old)
    assert "host_io_ratio" not in r2


def test_detail_name_is_round_stamped_and_never_overwrites(tmp_path):
    """r09 verdict task #3: full runs stamp the sidecar with the
    in-flight round (max committed BENCH_r{N} + 1) and uniquify rather
    than overwrite; --only runs use the scratch name."""
    (tmp_path / "BENCH_r07.json").write_text("{}")
    (tmp_path / "BENCH_r09.json").write_text("{}")
    assert bench.infer_round_stamp(tmp_path) == "r10"
    assert bench.resolve_detail_name(False, tmp_path) == "BENCH_DETAIL_r10.json"
    assert bench.resolve_detail_name(True, tmp_path) == "BENCH_DETAIL_partial.json"
    # an existing stamped file (builder benched earlier in the round)
    # is preserved: the new run gets a timestamp-suffixed sibling
    (tmp_path / "BENCH_DETAIL_r10.json").write_text("{}")
    name = bench.resolve_detail_name(False, tmp_path)
    assert name.startswith("BENCH_DETAIL_r10_") and name.endswith(".json")
    # empty repo -> r01 (first round)
    assert bench.infer_round_stamp(tmp_path / "nowhere") == "r01"


def test_committed_driver_artifacts_still_load():
    """Every committed BENCH_r*.json must load: r01-r07 via their intact
    tail lines, r08 via the reconstructed round-stamped snapshot."""
    root = Path(__file__).resolve().parent.parent
    import re as _re

    found = sorted(root.glob("BENCH_r[0-9]*.json"))
    assert found, "committed driver artifacts should exist"
    for f in found:
        loaded = bc.load(str(f))
        assert loaded["queries"], f.name
        if _re.search(r"BENCH_r08", f.name):
            assert len(loaded["queries"]) == 49 and loaded["value"] == 79.358


def test_adaptive_repeat_methodology_flagged():
    """When only one file carries the r09 sub-2s repeat top-up, the
    affected (short) names are reported and a stable-subset geomean
    over the long queries is published alongside the raw one."""
    new = {
        "queries": {"short": 0.5, "long": 10.0},
        "adaptive_repeat_under_sec": 2.0,
    }
    old = {"queries": {"short": 0.6, "long": 20.0}}
    r = bc.compare(new, old)
    assert r["adaptive_repeat_changed"] == ["short"]
    assert r["geomean_ratio_stable_subset"] == 0.5  # long only
    # both files on the same policy -> no flag
    old2 = dict(old, adaptive_repeat_under_sec=2.0)
    assert "adaptive_repeat_changed" not in bc.compare(new, old2)
