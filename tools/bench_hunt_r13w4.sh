#!/bin/bash
# Round-13 wave-4/5 sf1 certification hunt: the seven new queries in four
# short legs (short wall = less steal exposure), each self-stamping
# steal/contamination; a leg lands only when its run is clean.
cd /root/repo
CP='target/scala-2.13/debeziumnatscdcspark_2.13-0.1.0.jar:/opt/spark/jars/*'

run_bench() { # $1 queries, $2 out
  SPARK_GRAFT_SF_DIR=/root/repo/bench_scale/sf1 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_WAIT=120 SPARK_GRAFT_BENCH_ONLY=$1 \
  java -cp "$CP" graft.Bench > "$2" 2>"${2%.json}.err"
  grep -q '"contaminated":false' "$2"
}

declare -A LEGS=(
  [a]="doc_zipf,q44_assortativity"
  [b]="q43_link_pred"
  [c]="q42_harmonic"
  [d]="doc_lm_state,doc_lm_novelty,emb_centroid_outliers"
)

for i in $(seq 1 200); do
  all=y
  for l in a b c d; do [ -f /tmp/bench_r13w4_${l}_clean.json ] || all=n; done
  [ "$all" = y ] && { echo "[w4-hunt] ALL LEGS CLEAN"; break; }
  s0=$(awk '/^cpu /{print $9}' /proc/stat)
  sleep 20
  s1=$(awk '/^cpu /{print $9}' /proc/stat)
  d=$((s1-s0)); load=$(cut -d' ' -f1 /proc/loadavg)
  echo "[w4-hunt $i] steal20s=${d}ticks load=$load"
  if [ "$d" -lt 20 ] && awk "BEGIN{exit !($load < 1.5)}"; then
    for l in a b c d; do
      if [ ! -f /tmp/bench_r13w4_${l}_clean.json ]; then
        echo "[w4-hunt $i] quiet - leg $l (${LEGS[$l]})"
        run_bench "${LEGS[$l]}" /tmp/bench_r13w4_${l}_$i.json \
          && cp /tmp/bench_r13w4_${l}_$i.json /tmp/bench_r13w4_${l}_clean.json \
          && echo "[w4-hunt $i] leg $l CLEAN" \
          || echo "[w4-hunt $i] leg $l dirty"
        break
      fi
    done
  fi
done
