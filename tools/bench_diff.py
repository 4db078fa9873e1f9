#!/usr/bin/env python3
"""Regression tripwire over the committed quiet-pair benches.

Diffs two BENCH_QUIET_r{N}.json files (same schema as graft.Bench's
JSON line) and prints every query whose time moved by more than the
threshold ratio in either direction, plus adds/drops. Run at round
close against the previous round's committed pair and paste the block
into PLANS.md so drift gets named the round it happens (round-8
verdict item 6: q_diverse_sample drifted 0.80->1.27 s unnamed).

Usage: tools/bench_diff.py OLD.json NEW.json [threshold=1.5] [floor=0.3]

Queries under `floor` seconds in BOTH files are skipped: sub-300ms
entries are dominated by fixed DAG/stage latency whose jitter exceeds
any real signal (PLANS.md round-2 noise note).
"""
import json
import sys


def main():
    old_path, new_path = sys.argv[1], sys.argv[2]
    thresh = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    floor = float(sys.argv[4]) if len(sys.argv) > 4 else 0.3
    old = json.load(open(old_path))["queries"]
    new = json.load(open(new_path))["queries"]

    movers = []
    for q in sorted(set(old) & set(new)):
        a, b = old[q], new[q]
        if a < floor and b < floor:
            continue
        ratio = b / a if a > 0 else float("inf")
        if ratio >= thresh or ratio <= 1 / thresh:
            movers.append((ratio, q, a, b))

    print(f"# bench_diff {old_path} -> {new_path} "
          f"(threshold {thresh}x, floor {floor}s)")
    tot_old = sum(old.values())
    tot_new = sum(new.values())
    print(f"totals: {tot_old:.1f}s -> {tot_new:.1f}s "
          f"({tot_new / tot_old:.2f}x) over {len(old)} -> {len(new)} queries")
    for q in sorted(set(new) - set(old)):
        print(f"added:   {q} {new[q]:.2f}s")
    for q in sorted(set(old) - set(new)):
        print(f"dropped: {q} (was {old[q]:.2f}s)")
    if not movers:
        print(f"no movers beyond {thresh}x")
    for ratio, q, a, b in sorted(movers, reverse=True):
        tag = "SLOWER" if ratio > 1 else "faster"
        print(f"{tag}: {q} {a:.2f}s -> {b:.2f}s ({ratio:.2f}x)")


if __name__ == "__main__":
    main()
