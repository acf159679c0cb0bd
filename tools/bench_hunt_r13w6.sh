#!/bin/bash
# Round-13 waves 4-7 measurement hunt: the refreshed FULL sf0.1 sweep
# (191 queries) first, then the ten new queries at sf1 in short legs.
# Each run self-stamps steal/contamination; a leg lands only when clean.
cd /root/repo
CP='target/scala-2.13/debeziumnatscdcspark_2.13-0.1.0.jar:/opt/spark/jars/*'

run_bench() { # $1 sfdir, $2 queries(empty=all), $3 out
  if [ -n "$2" ]; then
    SPARK_GRAFT_SF_DIR=$1 SPARK_GRAFT_CPUS=32 SPARK_GRAFT_BENCH_WAIT=120 \
    SPARK_GRAFT_BENCH_ONLY=$2 \
    java -cp "$CP" graft.Bench > "$3" 2>"${3%.json}.err"
  else
    SPARK_GRAFT_SF_DIR=$1 SPARK_GRAFT_CPUS=32 SPARK_GRAFT_BENCH_WAIT=120 \
    java -cp "$CP" graft.Bench > "$3" 2>"${3%.json}.err"
  fi
  grep -q '"contaminated":false' "$3"
}

SF1=/root/repo/bench_scale/sf1
ORDER="full b c d e h"
declare -A Q=( [full]="" [b]="q43_link_pred" [c]="q42_harmonic"
  [d]="doc_lm_state,doc_lm_novelty,emb_centroid_outliers"
  [e]="q45_hyperball" [h]="doc_rank_eval" )
declare -A DIR=( [full]="/root/testdata/sf0.1" [b]="$SF1" [c]="$SF1"
  [d]="$SF1" [e]="$SF1" [h]="$SF1" )

for i in $(seq 1 300); do
  all=y
  for l in $ORDER; do [ -f /tmp/bench_r13w6_${l}_clean.json ] || all=n; done
  [ "$all" = y ] && { echo "[w6-hunt] ALL LEGS CLEAN"; break; }
  s0=$(awk '/^cpu /{print $9}' /proc/stat)
  sleep 20
  s1=$(awk '/^cpu /{print $9}' /proc/stat)
  d=$((s1-s0)); load=$(cut -d' ' -f1 /proc/loadavg)
  echo "[w6-hunt $i] steal20s=${d}ticks load=$load"
  if [ "$d" -lt 20 ] && awk "BEGIN{exit !($load < 1.5)}"; then
    for l in $ORDER; do
      if [ ! -f /tmp/bench_r13w6_${l}_clean.json ]; then
        echo "[w6-hunt $i] quiet - leg $l (${Q[$l]:-ALL} @ ${DIR[$l]})"
        run_bench "${DIR[$l]}" "${Q[$l]}" /tmp/bench_r13w6_${l}_$i.json \
          && cp /tmp/bench_r13w6_${l}_$i.json /tmp/bench_r13w6_${l}_clean.json \
          && echo "[w6-hunt $i] leg $l CLEAN" \
          || echo "[w6-hunt $i] leg $l dirty"
        break
      fi
    done
  fi
done
