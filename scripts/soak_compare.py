#!/usr/bin/env python3
"""Scale-soak comparator: given two graft.Bench JSON lines (a base tier
and a 10x tier), emit SOAK_<label>.json with per-query ratios and flag
queries whose wall-clock grew by more than the budget (default 10x, i.e.
linear-or-better in data size; O(n^2) operators and skew cliffs show up
as ratios far above the replica factor).

Small absolute times are noise-dominated (planning, JVM scheduling), so
queries under --floor seconds at the BASE tier are reported but only
flagged when their 10x cell ALSO exceeds the floor-scaled budget in
absolute terms.

Usage: soak_compare.py <base_bench.json> <big_bench.json> <out.json>
       [--budget 10] [--floor 0.5]
"""
import json
import sys


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    opts = {a.split("=")[0].lstrip("-"): float(a.split("=")[1])
            for a in sys.argv[1:] if a.startswith("--") and "=" in a}
    base_p, big_p, out_p = args[0], args[1], args[2]
    budget = opts.get("budget", 10.0)
    floor = opts.get("floor", 0.5)

    base = json.load(open(base_p))
    big = json.load(open(big_p))
    bq, gq = base["queries"], big["queries"]

    rows = {}
    flagged = []
    for name in sorted(bq):
        b, g = bq.get(name), gq.get(name)
        if b is None or g is None:
            flagged.append(name)
            rows[name] = {"base": b, "big": g, "ratio": None, "flag": "FAILED"}
            continue
        ratio = g / b if b > 0 else None
        # noise guard: sub-floor base cells only flag on absolute growth
        over = (g > b * budget) if b >= floor else (g > floor * budget)
        rows[name] = {"base": round(b, 3), "big": round(g, 3),
                      "ratio": round(ratio, 2) if ratio else None,
                      "flag": "OVER-BUDGET" if over else ""}
        if over:
            flagged.append(name)

    out = {
        "base_sf": base.get("sf"), "big_sf": big.get("sf"),
        "base_total": round(base["value"], 1), "big_total": round(big["value"], 1),
        "budget_x": budget, "floor_sec": floor,
        "n_queries": len(rows), "n_flagged": len(flagged),
        "flagged": flagged, "queries": rows,
    }
    json.dump(out, open(out_p, "w"), indent=1)
    print(f"[soak] {len(rows)} queries, {len(flagged)} over budget "
          f"({base['value']:.1f}s -> {big['value']:.1f}s total)")
    for f in flagged:
        print(f"  [flag] {f}: {rows[f]}")
    sys.exit(1 if flagged else 0)


if __name__ == "__main__":
    main()
