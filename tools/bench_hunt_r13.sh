#!/bin/bash
# Round-13 measurement hunt: land every artifact in quiet-host windows.
#  - full : the whole 171-query sweep at sf0.1 (clean_r13_local)
#  - x/y  : the six round-13 queries at sf1, two runtime-balanced chunks
#  - maint: Round13StreamMaintProbe (publish-first + follower latency)
#  - pr   : Round13PageRankSplitProbe (sf1 warm-start phases)
# Every leg self-stamps contaminated; a clean leg is kept and never
# re-run. Same quiet-window discipline as the r11/r12 hunts.
cd /root/repo
CP='target/scala-2.13/debeziumnatscdcspark_2.13-0.1.0.jar:/opt/spark/jars/*'
TCP="target/scala-2.13/test-classes:$CP"

run_bench() { # $1 sfdir, $2 queries(empty=all), $3 out
  # NOTE: an exported-but-empty SPARK_GRAFT_BENCH_ONLY used to select
  # ZERO queries and stamp a 0-second run clean (the r13 full-leg bug);
  # Bench now treats empty as unset, and we also only export it when set
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

done_full() { [ -f /tmp/bench_r13_full_clean.json ]; }
done_x()    { [ -f /tmp/bench_r13sf1_x_clean.json ]; }
done_y()    { [ -f /tmp/bench_r13sf1_y_clean.json ]; }
done_maint(){ [ -f bench/stream_maint_r13.json ] && grep -q '"contaminated":false' bench/stream_maint_r13.json; }
done_pr()   { [ -f bench/pagerank_split_r13.json ] && grep -q '"contaminated":false' bench/pagerank_split_r13.json; }

for i in $(seq 1 200); do
  if done_full && done_x && done_y && done_maint && done_pr; then
    echo "[r13-hunt] ALL LEGS CLEAN"; break
  fi
  s0=$(awk '/^cpu /{print $9}' /proc/stat)
  sleep 30
  s1=$(awk '/^cpu /{print $9}' /proc/stat)
  d=$((s1-s0)); load=$(cut -d' ' -f1 /proc/loadavg)
  echo "[r13-hunt $i] steal30s=${d}ticks load=$load full=$(done_full && echo y || echo n) x=$(done_x && echo y || echo n) y=$(done_y && echo y || echo n) maint=$(done_maint && echo y || echo n) pr=$(done_pr && echo y || echo n)"
  if [ "$d" -lt 30 ] && awk "BEGIN{exit !($load < 1.5)}"; then
    if ! done_x; then
      echo "[r13-hunt $i] quiet - sf1 chunk x"
      run_bench /root/repo/bench_scale/sf1 "q36_skew_join,q38_dp_sums,doc_bm25_state" /tmp/bench_r13sf1_x_$i.json \
        && cp /tmp/bench_r13sf1_x_$i.json /tmp/bench_r13sf1_x_clean.json \
        && echo "[r13-hunt $i] x CLEAN" || echo "[r13-hunt $i] x dirty"
    elif ! done_y; then
      echo "[r13-hunt $i] quiet - sf1 chunk y"
      run_bench /root/repo/bench_scale/sf1 "q37_bfs_hops,doc_substring_exact,emb_decontaminate_ann" /tmp/bench_r13sf1_y_$i.json \
        && cp /tmp/bench_r13sf1_y_$i.json /tmp/bench_r13sf1_y_clean.json \
        && echo "[r13-hunt $i] y CLEAN" || echo "[r13-hunt $i] y dirty"
    elif ! done_full; then
      echo "[r13-hunt $i] quiet - FULL sf0.1 sweep"
      run_bench /root/testdata/sf0.1 "" /tmp/bench_r13_full_$i.json \
        && cp /tmp/bench_r13_full_$i.json /tmp/bench_r13_full_clean.json \
        && echo "[r13-hunt $i] full CLEAN" || echo "[r13-hunt $i] full dirty"
    elif ! done_maint; then
      echo "[r13-hunt $i] quiet - stream maint probe"
      java -cp "$TCP" graft.Round13StreamMaintProbe > /tmp/maint_try_$i.log 2>&1
      done_maint && { echo "[r13-hunt $i] maint CLEAN"; grep "MAINT maint" /tmp/maint_try_$i.log; } || echo "[r13-hunt $i] maint dirty"
    else
      echo "[r13-hunt $i] quiet - pagerank split probe"
      java -cp "$TCP" graft.Round13PageRankSplitProbe > /tmp/prsplit_$i.log 2>&1
      done_pr && echo "[r13-hunt $i] pr CLEAN" || echo "[r13-hunt $i] pr dirty"
    fi
  fi
done
echo R13_HUNT_DONE
