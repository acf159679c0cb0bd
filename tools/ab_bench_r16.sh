#!/bin/bash
# A/B bench: run the SAME query subset against two jars back-to-back
# (interleaved A,B,A,B) so host weather hits both sides equally; each leg
# is a full graft.Bench run with the pinned reference query, so med/ref
# ratios are weather-normalized on top. Usage:
#   ab_bench.sh <jarA> <jarB> <queries-csv> <outdir> [sfdir] [legs-per-side]
set -u
JARA="$1"; JARB="$2"; QS="$3"; OUT="$4"
SF="${5:-/root/testdata/sf0.1}"
LEGS="${6:-2}"
mkdir -p "$OUT"
quiet() { # wait for a 30 s window with < 0.9 s host steal
  while :; do
    S0=$(awk '/^cpu /{print $9}' /proc/stat); sleep 30
    S1=$(awk '/^cpu /{print $9}' /proc/stat)
    D=$((S1 - S0))
    if [ "$D" -lt ${START_GATE_CS:-90} ]; then break; fi
    echo "steal gate: ${D}cs/30s — waiting"
  done
}
leg() { # $1 jar, $2 out.json
  quiet
  SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_WAIT=${BENCH_WAIT:-900} SPARK_GRAFT_BENCH_ONLY="$QS" \
  SPARK_GRAFT_BENCH_PROGRESS="${2%.json}.progress" \
    java -cp "$1:/opt/spark/jars/*" graft.Bench \
    > "${2%.json}.raw" 2> "${2%.json}.err"
  grep -o '{"metric".*' "${2%.json}.raw" | tail -1 > "$2"
  echo "leg $2 done: $(python3 -c "
import json
d=json.load(open('$2'))
print(round(d['value'],1),'s, contaminated:',d['contaminated'])" 2>/dev/null)"
}
for ((i=1; i<=LEGS; i++)); do
  leg "$JARA" "$OUT/a_$i.json"
  leg "$JARB" "$OUT/b_$i.json"
done
python3 - "$OUT" <<'EOF'
import json, sys, glob
out = sys.argv[1]
def best(paths):
    # per query: min med across legs (steal only inflates)
    res = {}
    for p in paths:
        try: d = json.load(open(p))
        except Exception: continue
        for q, st in d.get("query_stats", {}).items():
            if st["med"] < 0: continue
            cur = res.get(q)
            if cur is None or st["med"] < cur[0]:
                res[q] = (st["med"], st.get("ref", -1))
    return res
a = best(sorted(glob.glob(f"{out}/a_*.json")))
b = best(sorted(glob.glob(f"{out}/b_*.json")))
print(f"{'query':34s} {'A(before)':>10s} {'B(after)':>10s} {'B/A':>6s}")
ta = tb = 0.0
for q in sorted(set(a) | set(b)):
    ma = a.get(q, (float('nan'),))[0]; mb = b.get(q, (float('nan'),))[0]
    ta += ma if ma == ma else 0; tb += mb if mb == mb else 0
    print(f"{q:34s} {ma:10.2f} {mb:10.2f} {mb/ma if ma else 0:6.2f}")
print(f"{'TOTAL':34s} {ta:10.2f} {tb:10.2f} {tb/ta if ta else 0:6.2f}")
EOF
