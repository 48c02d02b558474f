"""Diff two trace_step.py --json dumps, normalized per sample.

Usage: python examples/diff_traces.py /tmp/ops256.json /tmp/ops512.json

Prints ops ranked by how much MORE per-sample time they take in B than in
A (the b512-regression attribution tool: a step is 'linear' in batch when
per-sample op time is flat; superlinear fusions float to the top here).
"""

import json
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    scale = d["batch"] * d["steps"]          # -> ms per 1k samples
    return d, {o["name"]: o["total_ms"] / scale * 1e3 for o in d["ops"]}


def main() -> None:
    a_raw, a = load(sys.argv[1])
    b_raw, b = load(sys.argv[2])
    rows = []
    for name in set(a) | set(b):
        pa, pb = a.get(name, 0.0), b.get(name, 0.0)
        rows.append((pb - pa, pa, pb, name))
    rows.sort(reverse=True)
    ta = sum(a.values())
    tb = sum(b.values())
    print(f"A: batch {a_raw['batch']}  {ta:8.2f} ms/1k samples "
          f"({1e6/ta:.0f} pairs/s)")
    print(f"B: batch {b_raw['batch']}  {tb:8.2f} ms/1k samples "
          f"({1e6/tb:.0f} pairs/s)")
    print(f"{'delta':>9} {'A':>9} {'B':>9}  op (ms per 1k samples)")
    for d, pa, pb, name in rows[:25]:
        print(f"{d:9.3f} {pa:9.3f} {pb:9.3f}  {name[:90]}")
    print("...")
    for d, pa, pb, name in rows[-5:]:
        print(f"{d:9.3f} {pa:9.3f} {pb:9.3f}  {name[:90]}")


if __name__ == "__main__":
    main()
