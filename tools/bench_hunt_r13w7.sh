#!/bin/bash
# Round-13 final measurement hunt, chunked: the 193-query sf0.1 sweep in
# THREE disjoint chunks (each needs only a ~6-10 min quiet window on this
# steal-stormy host; merged by tools/merge_bench_chunks.py), then the new
# queries at sf1 in short legs. Every run self-stamps steal/contamination.
cd /root/repo
CP='target/scala-2.13/debeziumnatscdcspark_2.13-0.1.0.jar:/opt/spark/jars/*'

run_bench() { # $1 sfdir, $2 queries, $3 out
  SPARK_GRAFT_SF_DIR=$1 SPARK_GRAFT_CPUS=32 SPARK_GRAFT_BENCH_WAIT=120 \
  SPARK_GRAFT_BENCH_ONLY=$2 \
  java -cp "$CP" graft.Bench > "$3" 2>"${3%.json}.err"
  grep -q '"contaminated":false' "$3"
}

SF1=/root/repo/bench_scale/sf1
SF01=/root/testdata/sf0.1
ORDER="f1 f2 f3 b c d e h"
declare -A Q=(
  [f1]="$(cat /tmp/qchunk_00.csv)"
  [f2]="$(cat /tmp/qchunk_01.csv)"
  [f3]="$(cat /tmp/qchunk_02.csv)"
  [b]="q43_link_pred" [c]="q42_harmonic"
  [d]="doc_lm_state,doc_lm_novelty,emb_centroid_outliers,doc_zipf_state,doc_quality_calibrate,doc_rank_eval"
  [e]="q45_hyperball" [h]="q45_eff_diameter" )
declare -A DIR=( [f1]="$SF01" [f2]="$SF01" [f3]="$SF01"
  [b]="$SF1" [c]="$SF1" [d]="$SF1" [e]="$SF1" [h]="$SF1" )

for i in $(seq 1 400); do
  all=y
  for l in $ORDER; do [ -f /tmp/bench_r13w7_${l}_clean.json ] || all=n; done
  [ "$all" = y ] && { echo "[w7-hunt] ALL LEGS CLEAN"; break; }
  s0=$(awk '/^cpu /{print $9}' /proc/stat)
  sleep 20
  s1=$(awk '/^cpu /{print $9}' /proc/stat)
  d=$((s1-s0)); load=$(cut -d' ' -f1 /proc/loadavg)
  echo "[w7-hunt $i] steal20s=${d}ticks load=$load"
  if [ "$d" -lt 20 ] && awk "BEGIN{exit !($load < 1.5)}"; then
    for l in $ORDER; do
      if [ ! -f /tmp/bench_r13w7_${l}_clean.json ]; then
        echo "[w7-hunt $i] quiet - leg $l @ ${DIR[$l]}"
        run_bench "${DIR[$l]}" "${Q[$l]}" /tmp/bench_r13w7_${l}_$i.json \
          && cp /tmp/bench_r13w7_${l}_$i.json /tmp/bench_r13w7_${l}_clean.json \
          && echo "[w7-hunt $i] leg $l CLEAN" \
          || echo "[w7-hunt $i] leg $l dirty"
        break
      fi
    done
  fi
done
