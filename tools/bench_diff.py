#!/usr/bin/env python3
"""Diff two committed bench artifacts (bench/r<N>.json) per query.

Usage:
    python3 tools/bench_diff.py r10 r11
    python3 tools/bench_diff.py bench/r10.json /tmp/bench_now.json

Each argument is either a round token (``r10`` -> ``bench/r10.json``
relative to the repo root) or a path to a bench JSON line as emitted by
``graft.Bench`` (the object with ``queries_warm``/``queries`` maps).

Reports, in order:
  * total warm time and query counts for both sides;
  * the NOISE FLOOR: the median per-query ratio across ALL common
    queries. Uniform box drift (thermal state, background load — the
    r16 close measured the SAME binary at 182-218 s back to back)
    moves every query by a common factor; the median ratio estimates
    that factor robustly (a real regression moves few queries, so it
    cannot drag the median). Every per-query ratio is DEFLATED by the
    floor before thresholding — r16's +29% total, pure drift, would
    have shown 343 ratios near 1.2x and a floor of 1.2x, flagging
    nothing; a genuine 2x regression still shows 2x/floor >> 1.5x.
  * REGRESSIONS: queries slower by more than REG_RATIO x AND more than
    REG_ABS_SEC seconds, both AFTER deflation (the judge's retro
    threshold — both must hold, so micro-queries jittering 2x at
    0.1 s don't page anyone);
  * improvements under the mirrored (deflated) threshold;
  * queries added/removed between the rounds.

The floor itself is BOUNDED (r18): deflation assumes the common
factor is box drift, but a code change that slows every query by the
same factor (a session-config or codegen regression) produces the
same signature. A floor outside [FLOOR_MIN, FLOOR_MAX] — far past any
drift this box has measured — is therefore NOT trusted: deflation is
disabled (floor treated as 1.0) and the exit is non-zero, forcing a
human to attribute the uniform shift before the round closes.

Exit status is 1 when any regression crosses the threshold (or the
floor left the trusted band), so the verify workflow can gate on it.
"""
import json
import os
import statistics
import sys

REG_RATIO = 1.5
REG_ABS_SEC = 0.5
# trusted box-drift band: the r16 close measured the SAME binary at
# 182-218 s back to back (~1.2x); anything past ~1.3x either way is
# not plausibly thermal/background drift on this box
FLOOR_MIN = 0.7
FLOOR_MAX = 1.3

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def resolve(token: str) -> str:
    if os.path.exists(token):
        return token
    cand = os.path.join(REPO, "bench", token + ".json")
    if os.path.exists(cand):
        return cand
    sys.exit(f"bench_diff: cannot resolve '{token}' "
             f"(not a file, and {cand} does not exist)")


def load(path: str) -> dict:
    with open(path) as f:
        doc = json.load(f)
    qs = doc.get("queries_warm") or doc.get("queries")
    if not qs:
        sys.exit(f"bench_diff: {path} has no queries_warm/queries map")
    return {"queries": qs,
            "total_warm": doc.get("total_warm"),
            "sf": doc.get("sf"),
            "failed": doc.get("warm_failed", doc.get("failed", []))}


def fmt(sec) -> str:
    return f"{sec:7.3f}s" if sec is not None else "      --"


def main(argv):
    if len(argv) != 3:
        sys.exit(__doc__)
    old_p, new_p = resolve(argv[1]), resolve(argv[2])
    old, new = load(old_p), load(new_p)
    oq, nq = old["queries"], new["queries"]

    print(f"old: {old_p}  ({len(oq)} queries, total_warm "
          f"{fmt(old['total_warm'])}, sf={old['sf']})")
    print(f"new: {new_p}  ({len(nq)} queries, total_warm "
          f"{fmt(new['total_warm'])}, sf={new['sf']})")
    for side, d in (("old", old), ("new", new)):
        if d["failed"]:
            print(f"!! {side} failed queries: {d['failed']}")

    common = sorted(set(oq) & set(nq))

    # noise floor: the median per-query ratio is the uniform box-drift
    # factor; deflate every comparison by it so only DIFFERENTIAL
    # slowdowns (this query moved, the fleet didn't) can flag
    ratios = sorted(nq[q] / oq[q] for q in common if oq[q] > 0)
    floor = statistics.median(ratios) if ratios else 1.0
    floor_suspect = not (FLOOR_MIN <= floor <= FLOOR_MAX)
    if ratios:
        p90 = ratios[min(len(ratios) - 1, int(0.9 * len(ratios)))]
        print(f"noise floor: median ratio {floor:.3f}x over "
              f"{len(ratios)} common queries (p90 {p90:.3f}x) — "
              f"per-query thresholds applied after deflating by it")
    if floor_suspect:
        # a uniform shift this large is indistinguishable from a
        # code-level everything-slowed regression — do NOT absorb it
        print(f"!! noise floor {floor:.3f}x is OUTSIDE the trusted "
              f"drift band [{FLOOR_MIN}, {FLOOR_MAX}] — deflation "
              "DISABLED; attribute the uniform shift (rerun on a "
              "quiet box, or find the code change) before closing")
        floor = 1.0

    regressions, improvements = [], []
    for q in common:
        a, b = oq[q], nq[q]
        an = a * floor  # `a` restated at the new box's speed
        if b > an * REG_RATIO and b - an > REG_ABS_SEC:
            regressions.append((b - an, q, a, b))
        elif an > b * REG_RATIO and an - b > REG_ABS_SEC:
            improvements.append((an - b, q, a, b))

    def table(title, rows):
        print(f"\n{title} ({len(rows)}) — threshold >{REG_RATIO}x "
              f"and >{REG_ABS_SEC}s after the {floor:.3f}x floor:")
        for delta, q, a, b in sorted(rows, reverse=True):
            print(f"  {q:<36} {fmt(a)} -> {fmt(b)}  "
                  f"({b / a:5.2f}x raw, {b / (a * floor):5.2f}x "
                  f"deflated, {delta:+.3f}s)")
        if not rows:
            print("  (none)")

    table("REGRESSIONS", regressions)
    table("improvements", improvements)

    added = sorted(set(nq) - set(oq))
    removed = sorted(set(oq) - set(nq))
    if added:
        print(f"\nadded ({len(added)}): " + ", ".join(added))
    if removed:
        print(f"\nremoved ({len(removed)}): " + ", ".join(removed))

    slowest = sorted(nq.items(), key=lambda kv: -kv[1])[:10]
    print("\nnew-side slowest 10:")
    for q, t in slowest:
        print(f"  {q:<36} {fmt(t)}")

    return 1 if regressions or floor_suspect else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
