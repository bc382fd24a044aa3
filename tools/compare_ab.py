"""digest two training runs' metrics.jsonl into a loss-curve table.

Usage: python tools/compare_ab.py /tmp/vr3/ab_a /tmp/vr3/ab_b [keys...]

Prints a markdown table of the itr_* window means at matched iteration
points (the MAX_ROIS A/B in DESIGN.md 'ROI capacity').
"""

import json
import sys


def load(d):
    rows = []
    with open(f"{d}/metrics.jsonl") as f:
        for line in f:
            if not line.strip():
                continue
            r = json.loads(line)
            if "itr_o" in r:
                rows.append(r)
    return rows


def main() -> None:
    a_dir, b_dir = sys.argv[1], sys.argv[2]
    keys = sys.argv[3:] or ["itr_o", "itr_c", "itr_r", "itr_t"]
    a, b = load(a_dir), load(b_dir)
    n = min(len(a), len(b))
    if n == 0:
        print(f"no itr_* rows yet (A: {len(a)}, B: {len(b)})")
        return
    picks = sorted({0, n // 4, n // 2, 3 * n // 4, n - 1})
    print("| iter | " + " | ".join(f"A {k} / B {k}" for k in keys) + " |")
    print("|" + "---|" * (len(keys) + 1))
    for i in picks:
        ra, rb = a[i], b[i]
        cells = [
            f"{ra[k]:.4g} / {rb[k]:.4g}" for k in keys
        ]
        it = int(ra["iter"])
        if int(rb["iter"]) != it:
            # different logging cadences: label both so the row is honest
            it = f"{it}/{int(rb['iter'])}"
        print(f"| {it} | " + " | ".join(cells) + " |")


if __name__ == "__main__":
    main()
