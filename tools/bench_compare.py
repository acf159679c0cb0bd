#!/usr/bin/env python3
"""Compare two bench artifacts per query (e.g. clean_r15 vs clean_r14).

usage: bench_compare.py old.json new.json [--floor=1.0] [--norm]

--floor deflates the new artifact's numbers by an environmental host-tax
factor (measured from an identical-code subset) before judging
regressions — per-query ratios are printed raw AND floor-adjusted.

--norm uses the round-15 paired-run reference samples instead: each
query's med divides by its own same-minute reference floor (the pinned
interleaved query), so host weather cancels per query and per round.
Falls back to raw meds for queries missing a ref in either artifact.
"""
import json
import statistics
import sys

args = [a for a in sys.argv[1:] if not a.startswith("--")]
floor = 1.0
norm = "--norm" in sys.argv[1:]
for a in sys.argv[1:]:
    if a.startswith("--floor="):
        floor = float(a.split("=", 1)[1])
oldj = json.load(open(args[0]))
newj = json.load(open(args[1]))
old = oldj["query_stats"]
new = newj["query_stats"]

if norm:
    for tag, j in (("old", oldj), ("new", newj)):
        r = j.get("ref")
        if r:
            print(f"{tag} ref: n={r['n']} min={r['min']} med={r['med']} "
                  f"max={r['max']} drift={r['drift']}x")


def val(stats, q):
    med = stats[q]["med"]
    ref = stats[q].get("ref", -1)
    if norm and ref and ref > 0:
        return med / ref
    return med


shared = sorted(set(old) & set(new))
added = sorted(set(new) - set(old))
ratios = []
for q in shared:
    o, n = val(old, q), val(new, q)
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
