#!/usr/bin/env python3
"""Compare two bench artifacts per query (e.g. clean_r14 vs clean_r13).

usage: bench_compare.py old.json new.json [--floor=1.0]

--floor deflates the new artifact's numbers by an environmental host-tax
factor (measured from an identical-code subset) before judging
regressions — per-query ratios are printed raw AND floor-adjusted.
"""
import json
import statistics
import sys

args = [a for a in sys.argv[1:] if not a.startswith("--")]
floor = 1.0
for a in sys.argv[1:]:
    if a.startswith("--floor="):
        floor = float(a.split("=", 1)[1])
old = json.load(open(args[0]))["query_stats"]
new = json.load(open(args[1]))["query_stats"]

shared = sorted(set(old) & set(new))
added = sorted(set(new) - set(old))
ratios = []
for q in shared:
    o, n = old[q]["med"], new[q]["med"]
    if o > 0:
        ratios.append((n / o, q, o, n))
ratios.sort(reverse=True)
tot_o = sum(old[q]["med"] for q in shared)
tot_n = sum(new[q]["med"] for q in shared)
print(f"shared {len(shared)} queries: old total {tot_o:.1f}s -> new "
      f"{tot_n:.1f}s = {tot_n / tot_o:.3f}x raw, "
      f"{tot_n / tot_o / floor:.3f}x floor-adjusted ({floor}x)")
print(f"median per-query ratio: "
      f"{statistics.median(r[0] for r in ratios):.3f}x raw")
print("\nworst 12 (raw / adjusted):")
for r, q, o, n in ratios[:12]:
    print(f"  {r:5.2f}x / {r / floor:5.2f}x  {q}  {o:.2f} -> {n:.2f}")
print("\nbest 5:")
for r, q, o, n in ratios[-5:]:
    print(f"  {r:5.2f}x / {r / floor:5.2f}x  {q}  {o:.2f} -> {n:.2f}")
print(f"\nnew queries ({len(added)}): total "
      f"{sum(new[q]['med'] for q in added):.1f}s")
for q in added:
    print(f"  {new[q]['med']:6.2f}s runs={new[q]['runs']} {q}")
