#!/usr/bin/env python3
"""Diff two graft bench JSONs (full-precision files written to
SPARK_GRAFT_BENCH_OUT, or BENCH_r{N}.json harness artifacts with a
"parsed" field). Flags per-query regressions beyond a threshold and
summarizes adds/removals.

Usage: bench_compare.py OLD.json NEW.json [--threshold 0.20] [--floor 0.3]
Regressions ignore queries under `floor` seconds in both runs — those sit
on the per-query scheduling floor where ratios are noise.
Exit code 1 if any regression exceeds the threshold.
"""
import argparse
import json
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    if "parsed" in d and d["parsed"]:
        d = d["parsed"]
    # harness artifacts use compact keys (q01), full-precision files use
    # full names (q01_agg_filter) — normalize to the qNN prefix
    d["queries"] = {k.split("_")[0]: v for k, v in d["queries"].items()}
    return d


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=0.20)
    ap.add_argument("--floor", type=float, default=0.3)
    args = ap.parse_args()

    old, new = load(args.old), load(args.new)
    oq, nq = old["queries"], new["queries"]
    shared = sorted(set(oq) & set(nq))
    added = sorted(set(nq) - set(oq))
    removed = sorted(set(oq) - set(nq))

    regress = []
    for k in shared:
        a, b = oq[k], nq[k]
        if a < args.floor and b < args.floor:
            continue
        if b > a * (1 + args.threshold):
            regress.append((k, a, b, b / a))

    # build_wall_sec (round 11): the one-time artifact prebuild, excluded
    # from every per-query serve time — add it back so round totals stay
    # apples-to-apples across rounds that moved work between build/serve.
    # Pre-r11 files never recorded it (their build cost hid inside serve
    # times), so a missing key means NOT COMPARABLE, not zero (ADVICE
    # r11: defaulting to 0.0 printed a phantom regression against them).
    print(f"old total {old['value']:.1f}s ({len(oq)} queries)  "
          f"new total {new['value']:.1f}s ({len(nq)} queries)")
    if "build_wall_sec" in old and "build_wall_sec" in new:
        ob, nb = old["build_wall_sec"], new["build_wall_sec"]
        print(f"with build wall: old {old['value'] + ob:.1f}s (+{ob:.1f})  "
              f"new {new['value'] + nb:.1f}s (+{nb:.1f})")
    else:
        missing = [n for n, d in (("old", old), ("new", new))
                   if "build_wall_sec" not in d]
        print(f"with build wall: n/a ({'/'.join(missing)} file predates "
              "build_wall_sec — totals not comparable on the build axis)")
    if old.get("prebuild_failed") or new.get("prebuild_failed"):
        print("WARNING: prebuild_failed set — serve floors smeared in that run")
    shared_old = sum(oq[k] for k in shared)
    shared_new = sum(nq[k] for k in shared)
    if shared:
        print(f"shared-{len(shared)} total: {shared_old:.1f}s -> "
              f"{shared_new:.1f}s (ratio {shared_new / shared_old:.2f})")
    if added:
        print(f"added ({len(added)}): "
              f"{', '.join(f'{k}={nq[k]:.2f}s' for k in added)}")
    if removed:
        print(f"removed ({len(removed)}): {', '.join(removed)}")
    if regress:
        print(f"\nREGRESSIONS (> {args.threshold:.0%}, both sides >= {args.floor}s):")
        for k, a, b, r in sorted(regress, key=lambda t: -t[3]):
            print(f"  {k:28s} {a:6.2f}s -> {b:6.2f}s  ({r:.2f}x)")
        sys.exit(1)
    print("no regressions beyond threshold")


if __name__ == "__main__":
    main()
