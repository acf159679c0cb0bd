#!/bin/bash
# Round-11 sf1 certification bench: hunt quiet-host windows and land clean
# artifacts for the 20 most expensive queries (by the r10 clean artifact)
# at sf0.1 and sf1. The host's steal bursts recur on a shorter period than
# a monolithic 13-minute sf1 run, so the sf1 side is split into SEVEN
# runtime-balanced chunks that each fit inside a quiet window and
# self-stamp contaminated:false independently; a clean chunk is kept and
# never re-run. tools/merge_bench_chunks.py assembles the final artifact.
# (The original 5-chunk split left one ~141 s chunk that failed six
# straight windows on mid-run steal; splitting it and the untried last
# chunk into ~60-90 s halves landed every leg within a few passes.)
cd /root/repo
declare -A CHUNK
CHUNK[a]=mm_audio_dedup
CHUNK[b]=doc_dedup_gate,q16_pagerank
CHUNK[c]=doc_substring_clusters,knn_ivf_append,cdc_scd2_incr,knn_ivf_index
CHUNK[d1]=doc_dedup_jaccard,doc_dedup_keep,doc_dup_clusters
CHUNK[d2]=doc_repetition,doc_split_leakage,doc_substring_overlap,q19_basket_triangles
CHUNK[e1]=q15_column_stats,q21_profile_diff,cdc_schema_evolution
CHUNK[e2]=mm_image_dedup,doc_dedup_simhash,doc_fingerprint
TOP20=${CHUNK[a]},${CHUNK[b]},${CHUNK[c]},${CHUNK[d1]},${CHUNK[d2]},${CHUNK[e1]},${CHUNK[e2]}

run_leg() { # $1 = sf dir, $2 = query list, $3 = out json
  SPARK_GRAFT_SF_DIR=$1 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_WAIT=120 SPARK_GRAFT_BENCH_ONLY=$2 \
  java -cp 'target/scala-2.13/debeziumnatscdcspark_2.13-0.1.0.jar:/opt/spark/jars/*' \
    graft.Bench > "$3" 2>"${3%.json}.err"
  grep -q '"contaminated":false' "$3"
}

all_done() {
  [ -f /tmp/bench_t20_01_clean.json ] || return 1
  for c in a b c d1 d2 e1 e2; do
    [ -f /tmp/bench_sf1_chunk_${c}_clean.json ] || return 1
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
    if [ ! -f /tmp/bench_t20_01_clean.json ]; then
      echo "[hunt $i] quiet - sf0.1 leg"
      if run_leg /root/testdata/sf0.1 "$TOP20" /tmp/bench_t20_01_$i.json; then
        cp /tmp/bench_t20_01_$i.json /tmp/bench_t20_01_clean.json
        echo "[hunt $i] sf0.1 leg CLEAN"
      else
        echo "[hunt $i] sf0.1 leg contaminated"
      fi
    else
      for c in a b c d1 d2 e1 e2; do
        if [ ! -f /tmp/bench_sf1_chunk_${c}_clean.json ]; then
          echo "[hunt $i] quiet - sf1 chunk $c"
          if run_leg bench_scale/sf1 "${CHUNK[$c]}" /tmp/bench_sf1_chunk_${c}_$i.json; then
            cp /tmp/bench_sf1_chunk_${c}_$i.json /tmp/bench_sf1_chunk_${c}_clean.json
            echo "[hunt $i] sf1 chunk $c CLEAN"
          else
            echo "[hunt $i] sf1 chunk $c contaminated"
          fi
          break
        fi
      done
    fi
  fi
done
