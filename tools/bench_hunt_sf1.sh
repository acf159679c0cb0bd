#!/bin/bash
# Round-11 sf1 certification bench: hunt a quiet-host window, then run the
# 20 most expensive queries (by the r10 clean sf0.1 artifact) twice —
# once at sf0.1, once at sf1 — so the scale ratios are same-session,
# same-conditions. Keeps the first attempt whose BOTH artifacts stamp
# contaminated:false.
cd /root/repo
TOP20=q15_column_stats,doc_dedup_gate,q16_pagerank,doc_substring_clusters,cdc_scd2_incr,q21_profile_diff,mm_image_dedup,cdc_schema_evolution,knn_ivf_append,doc_dedup_keep,doc_repetition,doc_dedup_jaccard,doc_split_leakage,mm_audio_dedup,doc_dedup_simhash,doc_fingerprint,doc_substring_overlap,q19_basket_triangles,knn_ivf_index,doc_dup_clusters
for i in $(seq 1 40); do
  s0=$(awk '/^cpu /{print $9}' /proc/stat)
  sleep 30
  s1=$(awk '/^cpu /{print $9}' /proc/stat)
  d=$((s1 - s0))
  load=$(cut -d' ' -f1 /proc/loadavg)
  echo "[hunt $i] steal30s=${d}ticks load=$load"
  if [ "$d" -lt 30 ] && awk "BEGIN{exit !($load < 1.5)}"; then
    echo "[hunt $i] quiet - running sf0.1 then sf1"
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
    SPARK_GRAFT_BENCH_WAIT=120 SPARK_GRAFT_BENCH_ONLY=$TOP20 \
    java -cp 'target/scala-2.13/debeziumnatscdcspark_2.13-0.1.0.jar:/opt/spark/jars/*' \
      graft.Bench > /tmp/bench_t20_01_$i.json 2>/tmp/bench_t20_01_$i.err
    SPARK_GRAFT_SF_DIR=bench_scale/sf1 SPARK_GRAFT_CPUS=32 \
    SPARK_GRAFT_BENCH_WAIT=120 SPARK_GRAFT_BENCH_ONLY=$TOP20 \
    java -cp 'target/scala-2.13/debeziumnatscdcspark_2.13-0.1.0.jar:/opt/spark/jars/*' \
      graft.Bench > /tmp/bench_t20_sf1_$i.json 2>/tmp/bench_t20_sf1_$i.err
    if grep -q '"contaminated":false' /tmp/bench_t20_01_$i.json && \
       grep -q '"contaminated":false' /tmp/bench_t20_sf1_$i.json; then
      cp /tmp/bench_t20_01_$i.json /tmp/bench_t20_01_clean.json
      cp /tmp/bench_t20_sf1_$i.json /tmp/bench_t20_sf1_clean.json
      echo "[hunt] CLEAN pair at try $i"
      break
    else
      echo "[hunt $i] contaminated again"
    fi
  fi
done
echo HUNT_DONE
