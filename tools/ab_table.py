#!/usr/bin/env python3
"""Merge ab_bench.sh artifacts into the comparison table (TUNE_r19's
hand-built adjudication device): per query, min-of-medians per binary
across its two interleaved runs — min absorbs a one-sided window hit,
since a transient stall inflates one run but cannot deflate the other —
plus the cur/ref ratio. Queries absent from the ref binary (added since
that commit) print n/a. Driver-side stdlib only."""
import json
import sys


def load(path):
    with open(path) as f:
        return json.load(f)


def main(argv):
    if len(argv) != 5:
        print("usage: ab_table.py ref1.json ref2.json cur1.json cur2.json")
        return 2
    ref = [load(argv[1]), load(argv[2])]
    cur = [load(argv[3]), load(argv[4])]
    # union across ALL FOUR artifacts: a query that errored out of both
    # cur runs (i.e. one the change may have BROKEN) must still appear in
    # the table body as a ref-only row, not vanish with only the errors
    # footer hinting at it — mirroring the existing ref-absent handling
    names = sorted(set().union(*(j.get("queries", {}) for j in ref + cur)))
    print(f"{'query':34} {'ref_s':>8} {'cur_s':>8} {'ratio':>7}"
          "   (min of two interleaved per-binary medians)")
    rt = ct = 0.0
    comparable = 0
    for n in names:
        cvals = [j["queries"][n] for j in cur if n in j.get("queries", {})]
        rvals = [j["queries"][n] for j in ref if n in j.get("queries", {})]
        if cvals and rvals:
            r, c = min(rvals), min(cvals)
            rt += r
            ct += c
            comparable += 1
            print(f"{n:34} {r:8.3f} {c:8.3f} {c / r:7.3f}")
        elif cvals:
            print(f"{n:34} {'n/a':>8} {min(cvals):8.3f} {'n/a':>7}")
        else:
            print(f"{n:34} {min(rvals):8.3f} {'n/a':>8} {'n/a':>7}")
    if comparable:
        print(f"{'TOTAL (comparable)':34} {rt:8.3f} {ct:8.3f} {ct / rt:7.3f}")
    for j, tag in [(ref[0], "ref1"), (ref[1], "ref2"),
                   (cur[0], "cur1"), (cur[1], "cur2")]:
        errs = j.get("errors") or {}
        if errs:
            print(f"errors[{tag}]: {errs}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
