#!/bin/bash
# Round-12 remaining legs: the three wave-3 queries at sf0.1 (the full
# 162-query clean artifact predates them) and the three sf1 heavyweight
# chunks. Same quiet-window discipline as bench_hunt_sf1.sh.
cd /root/repo
declare -A CHUNK
CHUNK[n3]="/root/testdata/sf0.1|emb_decontaminate,q16_pagerank_pers,q35_cube|/tmp/bench_r12_new3"
CHUNK[a]="/root/repo/bench_scale/sf1|q16_pagerank_incr,q26_communities_incr|/tmp/bench_r12sf1_chunk_a"
CHUNK[b]="/root/repo/bench_scale/sf1|q34_kcore,q32_adaptive_join,q33_dp_counts|/tmp/bench_r12sf1_chunk_b"
CHUNK[c]="/root/repo/bench_scale/sf1|cdc_dq_runbook,doc_bm25_topk,doc_rrf_rank|/tmp/bench_r12sf1_chunk_c"

run_leg() { # $1 sfdir, $2 queries, $3 out
  SPARK_GRAFT_SF_DIR=$1 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_WAIT=120 SPARK_GRAFT_BENCH_ONLY=$2 \
  java -cp 'target/scala-2.13/debeziumnatscdcspark_2.13-0.1.0.jar:/opt/spark/jars/*' \
    graft.Bench > "$3" 2>"${3%.json}.err"
  grep -q '"contaminated":false' "$3"
}

all_done() {
  for c in n3 a b c; do
    [ -f "$(echo ${CHUNK[$c]} | cut -d'|' -f3)_clean.json" ] || return 1
  done
}

for i in $(seq 1 160); do
  all_done && { echo "[hunt] ALL LEGS CLEAN"; break; }
  s0=$(awk '/^cpu /{print $9}' /proc/stat)
  sleep 30
  s1=$(awk '/^cpu /{print $9}' /proc/stat)
  d=$((s1-s0)); load=$(cut -d' ' -f1 /proc/loadavg)
  echo "[hunt $i] steal30s=${d}ticks load=$load"
  if [ "$d" -lt 30 ] && awk "BEGIN{exit !($load < 1.5)}"; then
    for c in n3 a b c; do
      IFS='|' read -r dir qs out <<< "${CHUNK[$c]}"
      [ -f "${out}_clean.json" ] && continue
      echo "[hunt $i] quiet - chunk $c ($qs)"
      if run_leg "$dir" "$qs" "${out}_$i.json"; then
        cp "${out}_$i.json" "${out}_clean.json"
        echo "[hunt $i] chunk $c CLEAN"
      else
        echo "[hunt $i] chunk $c contaminated"
      fi
      break
    done
  fi
done
all_done && python3 tools/merge_bench_chunks.py --expect=8 \
  /tmp/bench_r12sf1_chunk_a_clean.json \
  /tmp/bench_r12sf1_chunk_b_clean.json \
  /tmp/bench_r12sf1_chunk_c_clean.json \
  bench/clean_r12_sf1_new.json && \
  cp /tmp/bench_r12_new3_clean.json bench/clean_r12_sf01_new3.json
echo HUNT_DONE
