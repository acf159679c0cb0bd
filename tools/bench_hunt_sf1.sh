#!/bin/bash
# Round-11 sf1 certification bench: hunt quiet-host windows and land TWO
# clean artifacts — the 20 most expensive queries (by the r10 clean
# artifact) at sf0.1 and at sf1 — as INDEPENDENT legs, so one steal
# burst doesn't void both. Same jar, same knobs, same session; a leg
# that stamps contaminated:false is kept and not re-run.
cd /root/repo
TOP20=q15_column_stats,doc_dedup_gate,q16_pagerank,doc_substring_clusters,cdc_scd2_incr,q21_profile_diff,mm_image_dedup,cdc_schema_evolution,knn_ivf_append,doc_dedup_keep,doc_repetition,doc_dedup_jaccard,doc_split_leakage,mm_audio_dedup,doc_dedup_simhash,doc_fingerprint,doc_substring_overlap,q19_basket_triangles,knn_ivf_index,doc_dup_clusters
run_leg() { # $1 = sf dir, $2 = out json
  SPARK_GRAFT_SF_DIR=$1 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_WAIT=120 SPARK_GRAFT_BENCH_ONLY=$TOP20 \
  java -cp 'target/scala-2.13/debeziumnatscdcspark_2.13-0.1.0.jar:/opt/spark/jars/*' \
    graft.Bench > "$2" 2>"${2%.json}.err"
  grep -q '"contaminated":false' "$2"
}
for i in $(seq 1 60); do
  [ -f /tmp/bench_t20_01_clean.json ] && [ -f /tmp/bench_t20_sf1_clean.json ] && break
  s0=$(awk '/^cpu /{print $9}' /proc/stat)
  sleep 30
  s1=$(awk '/^cpu /{print $9}' /proc/stat)
  d=$((s1 - s0))
  load=$(cut -d' ' -f1 /proc/loadavg)
  echo "[hunt $i] steal30s=${d}ticks load=$load"
  if [ "$d" -lt 30 ] && awk "BEGIN{exit !($load < 1.5)}"; then
    if [ ! -f /tmp/bench_t20_01_clean.json ]; then
      echo "[hunt $i] quiet - sf0.1 leg"
      if run_leg /root/testdata/sf0.1 /tmp/bench_t20_01_$i.json; then
        cp /tmp/bench_t20_01_$i.json /tmp/bench_t20_01_clean.json
        echo "[hunt $i] sf0.1 leg CLEAN"
      else
        echo "[hunt $i] sf0.1 leg contaminated"
      fi
    elif [ ! -f /tmp/bench_t20_sf1_clean.json ]; then
      echo "[hunt $i] quiet - sf1 leg"
      if run_leg bench_scale/sf1 /tmp/bench_t20_sf1_$i.json; then
        cp /tmp/bench_t20_sf1_$i.json /tmp/bench_t20_sf1_clean.json
        echo "[hunt $i] sf1 leg CLEAN"
      else
        echo "[hunt $i] sf1 leg contaminated"
      fi
    fi
  fi
done
echo HUNT_DONE
