#!/usr/bin/env python
"""Replayable cross-round BENCH comparison.

The r07 verdict found a published cross-round ratio (COVERAGE.md's
"1.11x vs BENCH_r05") that did not reproduce from the shipped driver
JSONs — this script IS the computation now, so every claimed ratio
names its subset and replays from the committed files.

Method:
  * common subset = queries present in BOTH files;
  * methodology-changed names are EXCLUDED: any query that is
    rider-free in one file but not the other (the `rider_free` list;
    absent field = nothing rider-free, i.e. r06 and earlier) measured
    different arms, so its delta is a methodology change, not a plan
    change;
  * per-query ratio = new_sec / old_sec; reported as sum-ratio
    (total-wall view), geometric mean (each query equal weight) and
    median;
  * when both files carry `calibration_sec` (r08+: a fixed 8e9-row
    xxhash64 fold timed in-run), the host-normalized ratios divide by
    calibration_new / calibration_old — separating host-speed drift
    from plan regressions with arithmetic instead of inference.

Usage:
    python scripts/bench_compare.py BENCH_r07.json BENCH_r05.json
    (order: NEW OLD)
"""

from __future__ import annotations

import json
import math
import re
import statistics
import sys
from pathlib import Path


def _resolve_detail(path: str, summary: dict) -> dict:
    """r09+ bench output is a compact summary line plus a full-detail
    sidecar (the r08 all-in-one line overflowed the driver's 2000-char
    tail capture). Resolve the sidecar: try the round-stamped committed
    snapshot (BENCH_DETAIL_r07.json for BENCH_r07.json) first, then the
    `detail_file` name beside the input. A candidate only counts if its
    totals match the summary line — guards against pairing a summary
    with a stale sidecar from a different run."""
    here = Path(path).resolve().parent
    repo_root = Path(__file__).resolve().parent.parent
    candidates = []
    m = re.search(r"BENCH_(r\d+)\.json$", Path(path).name)
    if m:
        candidates.append(here / f"BENCH_DETAIL_{m.group(1)}.json")
        candidates.append(repo_root / f"BENCH_DETAIL_{m.group(1)}.json")
    if summary.get("detail_file"):
        candidates.append(here / summary["detail_file"])
        # bench.py writes the sidecar next to ITSELF (the repo root),
        # not the CWD — a summary redirected to /tmp still resolves
        candidates.append(repo_root / summary["detail_file"])
    for c in candidates:
        if not c.is_file():
            continue
        detail = json.loads(c.read_text())
        if detail.get("value") == summary.get("value") and len(
            detail.get("queries", {})
        ) == summary.get("n_queries"):
            return detail
    raise SystemExit(
        f"{path}: summary line references sidecar "
        f"{summary.get('detail_file')!r} but no candidate in {here} "
        "matches its value/n_queries — commit the round's "
        "BENCH_DETAIL_r{N}.json snapshot"
    )


def load(path: str) -> dict:
    """Accept bench.py's raw JSON line (full r08-era or compact r09+
    with sidecar) or the driver's BENCH_r*.json wrapper (bench stdout
    embedded in a `tail` string)."""
    with open(path) as f:
        d = json.load(f)
    if "queries" in d:
        return d
    if "queries_top" in d:  # raw compact summary saved to a file
        return _resolve_detail(path, d)
    truncated = None
    for line in reversed(d.get("tail", "").splitlines()):
        line = line.strip()
        if line.startswith('{"metric"'):
            try:
                parsed = json.loads(line)
            except json.JSONDecodeError:
                # tail-truncated at the END (r08 lost the head; this is
                # the other direction): the line keeps its '{"metric"'
                # prefix but is cut short — keep the fragment so the
                # snapshot fallback below can still enforce the
                # stale-sidecar guard on whatever fields survived
                truncated = truncated or line
                continue
            if "queries" in parsed:
                return parsed
            return _resolve_detail(path, parsed)
    # tail unparseable (r08: the all-in-one line overflowed the capture
    # buffer and lost its head) — fall back to a committed round-stamped
    # snapshot if one exists (BENCH_DETAIL_r08.json documents its own
    # reconstruction provenance in a `_note` key). The summary's keys
    # are ordered metric-first, so an END-truncated line usually keeps
    # `value` (and often `n_queries`): any such surviving field MUST
    # match the snapshot — without this check a truncated driver
    # artifact could silently pair with a DIFFERENT run's numbers
    # (e.g. the builder's earlier same-round record).
    m = re.search(r"BENCH_(r\d+)\.json$", Path(path).name)
    if m:
        snap = Path(path).resolve().parent / f"BENCH_DETAIL_{m.group(1)}.json"
        if snap.is_file():
            detail = json.loads(snap.read_text())
            if "queries" in detail:
                # the detail payload has no n_queries key; its query
                # count is the map itself
                expected = {
                    "value": detail.get("value"),
                    "n_queries": len(detail.get("queries", {})),
                }
                for field, cast in (("value", float), ("n_queries", int)):
                    got = re.search(rf'"{field}": ([0-9.]+)', truncated or "")
                    if not got:
                        continue
                    exp = expected[field]
                    # a snapshot MISSING the field (exp None) cannot
                    # vouch for the fragment either — same clean
                    # diagnostic, not a TypeError from cast(None)
                    if exp is None or cast(got.group(1)) != cast(exp):
                        raise SystemExit(
                            f"{path}: truncated tail line carries "
                            f"{field}={got.group(1)} but snapshot "
                            f"{snap.name} has {exp} — "
                            "different run; commit the matching "
                            "round-stamped snapshot"
                        )
                return detail
    raise SystemExit(f"{path}: no bench JSON line found")


def compare(new: dict, old: dict) -> dict:
    rf_new = set(new.get("rider_free") or [])
    rf_old = set(old.get("rider_free") or [])
    common = sorted(set(new["queries"]) & set(old["queries"]))
    changed_arm = sorted(n for n in common if (n in rf_new) != (n in rf_old))
    subset = [n for n in common if n not in changed_arm]
    ratios = {
        n: new["queries"][n] / old["queries"][n]
        for n in subset
        if old["queries"][n] > 0
    }
    sum_new = sum(new["queries"][n] for n in subset)
    sum_old = sum(old["queries"][n] for n in subset)
    out = {
        "subset_size": len(subset),
        "subset": subset,
        "excluded_methodology_changed": changed_arm,
        "sum_ratio": round(sum_new / sum_old, 3) if sum_old else None,
        "geomean_ratio": round(
            math.exp(statistics.fmean(math.log(r) for r in ratios.values())), 3
        )
        if ratios
        else None,
        "median_ratio": round(statistics.median(ratios.values()), 3)
        if ratios
        else None,
    }
    # r09 changed the estimator for SHORT queries: sub-2s names are
    # topped up to >=5 repeats (min over more samples is stochastically
    # lower on identical code), so when exactly one file carries the
    # adaptive policy, cross-file ratios on the affected names embed a
    # few-percent sample-size bias. They are REPORTED (not excluded —
    # most of the surface is sub-2s and exclusion would gut the subset)
    # plus a stable-subset geomean over the unaffected (>= threshold on
    # BOTH sides) names, which is the bias-free cross-round number.
    thr_new = new.get("adaptive_repeat_under_sec")
    thr_old = old.get("adaptive_repeat_under_sec")
    if (thr_new is None) != (thr_old is None):
        thr = thr_new if thr_new is not None else thr_old
        affected = sorted(
            n
            for n in subset
            if new["queries"][n] < thr or old["queries"][n] < thr
        )
        out["adaptive_repeat_changed"] = affected
        stable = {n: r for n, r in ratios.items() if n not in affected}
        out["geomean_ratio_stable_subset"] = (
            round(
                math.exp(statistics.fmean(math.log(r) for r in stable.values())), 3
            )
            if stable
            else None
        )
    cal_new, cal_old = new.get("calibration_sec"), old.get("calibration_sec")
    if cal_new and cal_old:
        host = cal_new / cal_old
        out["host_speed_ratio"] = round(host, 3)
        out["sum_ratio_host_normalized"] = (
            round(out["sum_ratio"] / host, 3) if out["sum_ratio"] else None
        )
        out["geomean_ratio_host_normalized"] = (
            round(out["geomean_ratio"] / host, 3) if out["geomean_ratio"] else None
        )
    # r10+: a second, I/O-phase calibration (fixed parquet write + read
    # + shuffle — bench.py io_calibration). The CPU fold under-captures
    # slow-I/O host phases (r09: same-code totals swung 2.9x while
    # calibration_sec moved 1.15x); both normalizations are reported so
    # an adjudicator can see which host dimension drifted.
    io_new, io_old = new.get("calibration_io_sec"), old.get("calibration_io_sec")
    if io_new and io_old:
        io = io_new / io_old
        out["host_io_ratio"] = round(io, 3)
        out["sum_ratio_io_normalized"] = (
            round(out["sum_ratio"] / io, 3) if out["sum_ratio"] else None
        )
        out["geomean_ratio_io_normalized"] = (
            round(out["geomean_ratio"] / io, 3) if out["geomean_ratio"] else None
        )
    return out


def main() -> None:
    if len(sys.argv) != 3:
        raise SystemExit(__doc__)
    new, old = load(sys.argv[1]), load(sys.argv[2])
    result = compare(new, old)
    result["new_file"], result["old_file"] = sys.argv[1], sys.argv[2]
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
