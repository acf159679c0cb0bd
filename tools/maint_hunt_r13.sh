#!/bin/bash
# Hunt a quiet-host window for the round-13 stream-maintenance probe:
# probe steal for 30 s; if quiet, run the probe (it self-stamps
# per-config steal + a contaminated flag); keep the first clean artifact.
cd /root/repo
for i in $(seq 1 40); do
  s0=$(awk '/^cpu /{print $9}' /proc/stat)
  sleep 30
  s1=$(awk '/^cpu /{print $9}' /proc/stat)
  d=$((s1 - s0))
  load=$(cut -d' ' -f1 /proc/loadavg)
  echo "[maint-hunt $i] steal30s=${d}ticks load=$load"
  if [ "$d" -lt 30 ] && awk "BEGIN{exit !($load < 1.5)}"; then
    echo "[maint-hunt $i] quiet - running probe"
    java -cp 'target/scala-2.13/test-classes:target/scala-2.13/debeziumnatscdcspark_2.13-0.1.0.jar:/opt/spark/jars/*' \
      graft.Round13StreamMaintProbe > /tmp/maint_try_$i.log 2>&1
    if grep -q '"contaminated":false' bench/stream_maint_r13.json; then
      echo "[maint-hunt] CLEAN artifact at try $i"
      grep MAINT /tmp/maint_try_$i.log | grep -v phases
      break
    else
      echo "[maint-hunt $i] contaminated - retry"
    fi
  fi
done
echo MAINT_HUNT_DONE
