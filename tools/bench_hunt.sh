#!/bin/bash
# Hunt for a quiet-host window: probe steal for 30s; if clean, run the
# bench; keep the first artifact that stamps contaminated:false.
cd /root/repo
for i in $(seq 1 40); do
  s0=$(awk '/^cpu /{print $9}' /proc/stat)
  sleep 30
  s1=$(awk '/^cpu /{print $9}' /proc/stat)
  d=$((s1 - s0))
  load=$(cut -d' ' -f1 /proc/loadavg)
  echo "[hunt $i] steal30s=${d}ticks load=$load"
  # < 30 ticks (0.3 s) over 30 s and load < 1.5
  if [ "$d" -lt 30 ] && awk "BEGIN{exit !($load < 1.5)}"; then
    echo "[hunt $i] quiet - running bench"
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
    SPARK_GRAFT_BENCH_WAIT=120 \
    java -cp 'target/scala-2.13/debeziumnatscdcspark_2.13-0.1.0.jar:/opt/spark/jars/*' \
      graft.Bench > /tmp/bench_try_$i.json 2>/tmp/bench_try_$i.err
    if grep -q '"contaminated":false' /tmp/bench_try_$i.json; then
      cp /tmp/bench_try_$i.json /tmp/bench_clean.json
      echo "[hunt] CLEAN artifact at try $i"
      break
    else
      echo "[hunt $i] contaminated again"
    fi
  fi
done
echo HUNT_DONE
