#!/usr/bin/env python3
"""Round-over-round bench trend: diff a new envelope against the prior
round's committed one, flagging >2x moves per headline query and per leg.

Round-12 verdict "Next round" #5: the contention flag compares against
fixed thresholds, but the repo carries 12+ rounds of committed envelopes
— a mechanical diff against the PRIOR round would have caught every
contention incident of rounds 9-12 (scale_100m 13.3->55.1 s, freshness
1.3->19.2 s, dedup_exact_by_hash 0.11->0.61 s) the moment the artifact
landed, instead of a judge reconstructing it a round later.

Usage:
    python3 tools/bench_trend.py NEW_ENVELOPE OLD_ENVELOPE \
        [--detail NEW_DETAIL OLD_DETAIL]

NEW/OLD_ENVELOPE are BENCH_HEADLINE.json-shaped files (the committed one
from the prior round via `git show <sha>:BENCH_HEADLINE.json`, or a
BENCH_r{N}.json whose `parsed` object carries the same keys). --detail
adds the full per-query sweep diff from bench_detail.json-shaped files
(committed as BENCH_DETAIL_r{N}.json each round).

Driver-side tooling only (python is not available to the engine).
Exit code: 0 always — this is a trend REPORTER; the flags it prints are
evidence for SURVEY round notes, not a gate.
"""
import json
import sys

FLAG_RATIO = 2.0       # a >2x move either way earns a flag line
ABS_FLOOR = 0.05       # ignore ratio noise under 50 ms absolute delta


def load(path):
    with open(path) as f:
        d = json.load(f)
    # a driver BENCH_r{N}.json wraps the envelope under "parsed"
    if "parsed" in d and isinstance(d["parsed"], dict):
        d = d["parsed"]
    return d


def diff_map(name, new, old, out, tm_new=None, tm_old=None):
    """tm_new/tm_old: the details' trained_models maps (query -> model
    keys the timed run trained). With the model registry, a family's
    first query in sweep order pays training — when sweep membership
    shifts, the cost MOVES between queries. A query that newly pays
    training is flagged TRAINING-MOVED (informational), not REGRESSED;
    one that stopped paying is TRAINING-LEFT, not improved (round-14
    verdict "Next round" #6)."""
    tm_new, tm_old = tm_new or {}, tm_old or {}
    keys = sorted(set(new) & set(old))
    for k in keys:
        # medians only: _min/_max/_first/host_*/heap_* are dispersion
        # and environment evidence, not the trended value
        if k.endswith(("_min", "_max", "_first")) or k.startswith(("host_", "heap_")):
            continue
        nv, ov = new[k], old[k]
        if not isinstance(nv, (int, float)) or not isinstance(ov, (int, float)):
            continue
        if nv < 0 or ov <= 0:
            status = "FAILED" if nv < 0 else ""
            out.append((name, k, ov, nv, float("nan"), status))
            continue
        ratio = nv / ov
        flag = ""
        if abs(nv - ov) > ABS_FLOOR:
            if ratio > FLAG_RATIO:
                flag = "REGRESSED"
                if set(tm_new.get(k, [])) - set(tm_old.get(k, [])):
                    flag = "TRAINING-MOVED"
            elif ratio < 1.0 / FLAG_RATIO:
                flag = "improved"
                if set(tm_old.get(k, [])) - set(tm_new.get(k, [])):
                    flag = "TRAINING-LEFT"
        out.append((name, k, ov, nv, ratio, flag))


def main():
    args = sys.argv[1:]
    detail_paths = None
    if "--detail" in args:
        i = args.index("--detail")
        detail_paths = (args[i + 1], args[i + 2])
        args = args[:i] + args[i + 3:]
    if len(args) != 2:
        print(__doc__)
        return 2
    new, old = load(args[0]), load(args[1])

    rows = []
    diff_map("headline", new.get("queries", {}), old.get("queries", {}), rows)
    for leg in ("freshness", "scale_10m", "scale_10m_warm", "scale_100m"):
        diff_map(leg, new.get(leg, {}), old.get(leg, {}), rows)
    scalars_new = {k: new[k] for k in ("value", "total_all_queries_sec")
                   if isinstance(new.get(k), (int, float))}
    scalars_old = {k: old[k] for k in ("value", "total_all_queries_sec")
                   if isinstance(old.get(k), (int, float))}
    diff_map("totals", scalars_new, scalars_old, rows)

    if detail_paths:
        dn, do = load(detail_paths[0]), load(detail_paths[1])
        diff_map("sweep", dn.get("queries", {}), do.get("queries", {}), rows,
                 dn.get("trained_models", {}), do.get("trained_models", {}))

    flags = [r for r in rows if r[5]]
    print(f"bench_trend: {len(rows)} comparable metrics, "
          f"{sum(1 for r in flags if r[5] == 'REGRESSED')} regressed >2x, "
          f"{sum(1 for r in flags if r[5] == 'improved')} improved >2x, "
          f"{sum(1 for r in flags if r[5] == 'FAILED')} newly failed, "
          f"{sum(1 for r in flags if r[5].startswith('TRAINING'))} training-moved")
    env_bits = []
    for side, d in (("new", new), ("old", old)):
        hc = d.get("host_contended")
        lc = d.get("leg_contended", [])
        env_bits.append(f"{side}: host_contended={hc} leg_contended={lc}")
    print("envelopes: " + " | ".join(env_bits))
    for name, k, ov, nv, ratio, flag in sorted(
            flags, key=lambda r: -(r[4] if r[4] == r[4] else 1e9)):
        print(f"  {flag:9s} {name}/{k}: {ov:.3f} -> {nv:.3f} "
              f"({'x%.2f' % ratio if ratio == ratio else 'n/a'})")
    if not flags:
        print("  (no >2x moves)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
