#!/bin/bash
# Round-12 sf1 certification bench: the round's new heavyweights at sf1
# (their sf0.1 comparables live in the full clean_r12_local artifact).
# Same discipline as bench_hunt_sf1.sh: hunt quiet-host windows, run
# runtime-balanced chunks that self-stamp contaminated:false, keep clean
# legs, assemble with tools/merge_bench_chunks.py.
cd /root/repo
declare -A CHUNK
CHUNK[a]=q16_pagerank_incr,q26_communities_incr
CHUNK[b]=q34_kcore,q32_adaptive_join,q33_dp_counts
CHUNK[c]=cdc_dq_runbook,doc_bm25_topk,doc_rrf_rank

run_leg() { # $1 = sf dir, $2 = query list, $3 = out json
  SPARK_GRAFT_SF_DIR=$1 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_WAIT=120 SPARK_GRAFT_BENCH_ONLY=$2 \
  java -cp 'target/scala-2.13/debeziumnatscdcspark_2.13-0.1.0.jar:/opt/spark/jars/*' \
    graft.Bench > "$3" 2>"${3%.json}.err"
  grep -q '"contaminated":false' "$3"
}

all_done() {
  for c in a b c; do
    [ -f /tmp/bench_r12sf1_chunk_${c}_clean.json ] || return 1
  done
}

for i in $(seq 1 120); do
  all_done && { echo "[hunt] ALL LEGS CLEAN"; break; }
  s0=$(awk '/^cpu /{print $9}' /proc/stat)
  sleep 30
  s1=$(awk '/^cpu /{print $9}' /proc/stat)
  d=$((s1-s0))
  load=$(cut -d' ' -f1 /proc/loadavg)
  echo "[hunt $i] steal30s=${d}ticks load=$load"
  if [ "$d" -lt 30 ] && awk "BEGIN{exit !($load < 1.5)}"; then
    for c in a b c; do
      [ -f /tmp/bench_r12sf1_chunk_${c}_clean.json ] && continue
      echo "[hunt $i] quiet - sf1 chunk $c (${CHUNK[$c]})"
      if run_leg /root/repo/bench_scale/sf1 "${CHUNK[$c]}" \
          /tmp/bench_r12sf1_chunk_${c}_$i.json; then
        cp /tmp/bench_r12sf1_chunk_${c}_$i.json \
          /tmp/bench_r12sf1_chunk_${c}_clean.json
        echo "[hunt $i] chunk $c CLEAN"
      else
        echo "[hunt $i] chunk $c contaminated"
      fi
      break # one leg per quiet probe; re-probe before the next
    done
  fi
done
all_done && python3 tools/merge_bench_chunks.py --expect=8 \
  /tmp/bench_r12sf1_chunk_a_clean.json \
  /tmp/bench_r12sf1_chunk_b_clean.json \
  /tmp/bench_r12sf1_chunk_c_clean.json \
  bench/clean_r12_sf1_new.json
echo HUNT_DONE
