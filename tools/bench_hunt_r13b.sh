#!/bin/bash
# Round-13 second measurement hunt: the two legs still outstanding after
# the wave-2 additions landed.
#  - full : the whole 175-query sweep at sf0.1 (clean_r13_local)
#  - z    : the three wave-2 queries at sf1 (q39_sssp, q40_hits,
#           doc_dsir_weights)
# Every leg self-stamps contaminated; a clean leg is kept and never
# re-run. Same quiet-window discipline as the earlier hunts.
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

done_full() { [ -f /tmp/bench_r13_full_clean.json ]; }
done_z()    { [ -f /tmp/bench_r13sf1_z_clean.json ]; }

for i in $(seq 1 300); do
  if done_full && done_z; then
    echo "[r13b-hunt] ALL LEGS CLEAN"; break
  fi
  s0=$(awk '/^cpu /{print $9}' /proc/stat)
  sleep 30
  s1=$(awk '/^cpu /{print $9}' /proc/stat)
  d=$((s1-s0)); load=$(cut -d' ' -f1 /proc/loadavg)
  echo "[r13b-hunt $i] steal30s=${d}ticks load=$load full=$(done_full && echo y || echo n) z=$(done_z && echo y || echo n)"
  if [ "$d" -lt 30 ] && awk "BEGIN{exit !($load < 1.5)}"; then
    if ! done_z; then
      echo "[r13b-hunt $i] quiet - sf1 chunk z"
      run_bench /root/repo/bench_scale/sf1 "q39_sssp,q40_hits,doc_dsir_weights" /tmp/bench_r13sf1_z_$i.json \
        && cp /tmp/bench_r13sf1_z_$i.json /tmp/bench_r13sf1_z_clean.json \
        && echo "[r13b-hunt $i] z CLEAN" || echo "[r13b-hunt $i] z dirty"
    else
      echo "[r13b-hunt $i] quiet - FULL sf0.1 sweep"
      run_bench /root/testdata/sf0.1 "" /tmp/bench_r13_full_$i.json \
        && cp /tmp/bench_r13_full_$i.json /tmp/bench_r13_full_clean.json \
        && echo "[r13b-hunt $i] full CLEAN" || echo "[r13b-hunt $i] full dirty"
    fi
  fi
done
echo R13B_HUNT_DONE
