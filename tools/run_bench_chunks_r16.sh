#!/bin/bash
# Chunked clean-sweep runner for bursty-steal hosts: split the query set
# into small chunks, run each as an independent graft.Bench (which does
# its own steal-gated pre-wait), retry any chunk that lands
# contaminated, and merge with tools/merge_bench_chunks.py.
#
# usage: run_bench_chunks.sh <names-file> <chunk-size> <outdir> <sfdir>
set -u
NAMES_FILE="$1"; CHUNK=$2; OUTDIR="$3"; SFDIR="$4"
JAR=target/scala-2.13/debeziumnatscdcspark_2.13-0.1.0.jar
mkdir -p "$OUTDIR"
mapfile -t ALL < "$NAMES_FILE"
N=${#ALL[@]}
NCHUNKS=$(( (N + CHUNK - 1) / CHUNK ))
for ((c=0; c<NCHUNKS; c++)); do
  OUT="$OUTDIR/chunk_$c.json"
  # already clean from a prior invocation -> keep it
  if [ -f "$OUT" ] && python3 -c "
import json,sys
d=json.load(open('$OUT'))
sys.exit(0 if d.get('contaminated') is False else 1)" 2>/dev/null; then
    echo "chunk $c: already clean, skipping"
    continue
  fi
  QS=$(printf '%s\n' "${ALL[@]:$((c*CHUNK)):$CHUNK}" | paste -sd,)
  for attempt in 1 2 3 4 5 6 7 8 9 10 11 12; do
    # shell-level steal gate: don't even pay JVM startup while the host
    # neighbor is stealing — require a 30 s window with < 0.9 s steal
    while :; do
      S0=$(awk '/^cpu /{print $9}' /proc/stat); sleep 30
      S1=$(awk '/^cpu /{print $9}' /proc/stat)
      D=$((S1 - S0))
      if [ "$D" -lt ${START_GATE_CS:-90} ]; then break; fi
      echo "steal gate: ${D}cs/30s — waiting"
    done
    echo "chunk $c attempt $attempt: $QS"
    SPARK_GRAFT_SF_DIR="$SFDIR" SPARK_GRAFT_CPUS=32 \
    SPARK_GRAFT_BENCH_WAIT=${BENCH_WAIT:-900} SPARK_GRAFT_BENCH_ONLY="$QS" \
    SPARK_GRAFT_BENCH_PROGRESS="$OUTDIR/progress_${c}.json" \
      java -cp "$JAR:/opt/spark/jars/*" graft.Bench \
      > "$OUTDIR/chunk_${c}.raw" 2> "$OUTDIR/chunk_${c}.err"
    grep -o '{"metric".*' "$OUTDIR/chunk_${c}.raw" | tail -1 > "$OUT"
    if python3 -c "
import json,sys
d=json.load(open('$OUT'))
sys.exit(0 if d.get('contaminated') is False else 1)" 2>/dev/null; then
      echo "chunk $c: clean"
      break
    fi
    echo "chunk $c: contaminated, retrying"
    rm -f "$OUT"
    sleep 30
  done
done
ls "$OUTDIR"/chunk_*.json >/dev/null 2>&1 || { echo "no chunks"; exit 1; }
CHUNK_FILES=()
for ((c=0; c<NCHUNKS; c++)); do CHUNK_FILES+=("$OUTDIR/chunk_$c.json"); done
python3 tools/merge_bench_chunks.py --expect=$N \
  "${CHUNK_FILES[@]}" "$OUTDIR/merged.json"
