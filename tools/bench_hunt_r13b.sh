#!/bin/bash
# Round-13 second measurement hunt (v2): full first, then the wave-2 sf1
# chunk SPLIT into two short legs (the r11 lesson: shorter wall = less
# steal exposure; the 4-min combined z leg failed 4 straight storms).
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
done_z1()   { [ -f /tmp/bench_r13sf1_z1_clean.json ]; }
done_z2a()  { [ -f /tmp/bench_r13sf1_z2a_clean.json ]; }
done_z2b()  { [ -f /tmp/bench_r13sf1_z2b_clean.json ]; }

for i in $(seq 1 400); do
  if done_full && done_z1 && done_z2a && done_z2b; then
    echo "[r13b-hunt] ALL LEGS CLEAN"; break
  fi
  s0=$(awk '/^cpu /{print $9}' /proc/stat)
  sleep 30
  s1=$(awk '/^cpu /{print $9}' /proc/stat)
  d=$((s1-s0)); load=$(cut -d' ' -f1 /proc/loadavg)
  echo "[r13b-hunt $i] steal30s=${d}ticks load=$load full=$(done_full && echo y || echo n) z1=$(done_z1 && echo y || echo n) z2a=$(done_z2a && echo y || echo n) z2b=$(done_z2b && echo y || echo n)"
  if [ "$d" -lt 30 ] && awk "BEGIN{exit !($load < 1.5)}"; then
    if ! done_full; then
      echo "[r13b-hunt $i] quiet - FULL sf0.1 sweep"
      run_bench /root/testdata/sf0.1 "" /tmp/bench_r13_full_$i.json \
        && cp /tmp/bench_r13_full_$i.json /tmp/bench_r13_full_clean.json \
        && echo "[r13b-hunt $i] full CLEAN" || echo "[r13b-hunt $i] full dirty"
    elif ! done_z1; then
      echo "[r13b-hunt $i] quiet - sf1 chunk z1 (sssp)"
      run_bench /root/repo/bench_scale/sf1 "q39_sssp" /tmp/bench_r13sf1_z1_$i.json \
        && cp /tmp/bench_r13sf1_z1_$i.json /tmp/bench_r13sf1_z1_clean.json \
        && echo "[r13b-hunt $i] z1 CLEAN" || echo "[r13b-hunt $i] z1 dirty"
    elif ! done_z2a; then
      echo "[r13b-hunt $i] quiet - sf1 chunk z2a (hits)"
      run_bench /root/repo/bench_scale/sf1 "q40_hits" /tmp/bench_r13sf1_z2a_$i.json \
        && cp /tmp/bench_r13sf1_z2a_$i.json /tmp/bench_r13sf1_z2a_clean.json \
        && echo "[r13b-hunt $i] z2a CLEAN" || echo "[r13b-hunt $i] z2a dirty"
    else
      echo "[r13b-hunt $i] quiet - sf1 chunk z2b (dsir + weighted pr)"
      run_bench /root/repo/bench_scale/sf1 "doc_dsir_weights,q41_pagerank_weighted" /tmp/bench_r13sf1_z2b_$i.json \
        && cp /tmp/bench_r13sf1_z2b_$i.json /tmp/bench_r13sf1_z2b_clean.json \
        && echo "[r13b-hunt $i] z2b CLEAN" || echo "[r13b-hunt $i] z2b dirty"
    fi
  fi
done
echo R13B_HUNT_DONE
