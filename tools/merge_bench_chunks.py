#!/usr/bin/env python3
"""Assemble the chunked sf1 certification bench into one artifact.

Each chunk is an independent graft.Bench run that stamped
contaminated:false under the rate-aware run-steal gate; the merge is a
plain union of their per-query stats (chunks are disjoint by
construction) with provenance per chunk. Refuses any contaminated or
missing chunk.
"""
import json
import sys

args = sys.argv[1:]
expect = None
if args and args[0].startswith("--expect="):
    expect = int(args[0].split("=", 1)[1])
    args = args[1:]
if len(args) < 2:
    sys.exit("usage: merge_bench_chunks.py [--expect=NQUERIES] "
             "chunk1.json [chunk2.json ...] out.json")
chunks = args[:-1]
out = args[-1]
merged = {"metric": "total", "value": 0.0, "unit": "sec", "sf": None,
          "queries": {}, "query_stats": {}, "chunks": [], "flagged": [],
          "contaminated": False}
for path in chunks:
    with open(path) as f:
        d = json.load(f)
    if d.get("contaminated") is not False:
        sys.exit(f"chunk {path} is not clean")
    if merged["sf"] is None:
        merged["sf"] = d["sf"]
    assert d["sf"] == merged["sf"], f"sf mismatch in {path}"
    overlap = set(d["query_stats"]) & set(merged["query_stats"])
    assert not overlap, f"duplicate queries {overlap} in {path}"
    merged["query_stats"].update(d["query_stats"])
    for q, st in d["query_stats"].items():
        merged["queries"][q] = st["med"]
    merged["value"] += d["value"]
    merged["flagged"] += d.get("flagged", [])
    merged["chunks"].append({
        "path": path, "value": d["value"], "run_wall": d.get("run_wall"),
        "steal_sec": d.get("steal_sec"), "ref": d.get("ref"),
        "queries": sorted(d["query_stats"])})
refs = [c["ref"] for c in merged["chunks"] if c.get("ref")]
if refs:
    meds = sorted(r["med"] for r in refs)
    mn = min(r["min"] for r in refs)
    mx = max(r["max"] for r in refs)
    merged["ref"] = {"n": sum(r["n"] for r in refs), "min": mn,
                     "med": meds[len(meds) // 2], "max": mx,
                     "drift": round(mx / max(mn, 1e-9), 3)}
if not merged["queries"]:
    sys.exit("refusing to write an empty merged artifact (no queries)")
if expect is not None and len(merged["queries"]) != expect:
    sys.exit(f"expected {expect} queries, merged {len(merged['queries'])} "
             "— a chunk is missing")
with open(out, "w") as f:
    json.dump(merged, f, indent=1)
print(f"merged {len(chunks)} chunks, {len(merged['queries'])} queries, "
      f"total {merged['value']:.1f}s -> {out}")
