#!/bin/bash
# Round-15 measurement hunt (run AFTER the main chunked sf0.1 sweep):
#  - sf1      : the nine round-14/15 crawl+graph queries at sf1
#               (bench_scale/sf1, generated round 11 via ScaleDataGen)
#  - keepincr : doc_dedup_keep_incr re-probe (r14 flagged 2.94x on
#               untouched code — decide noise vs real before optimizing)
# Every leg self-stamps contaminated; a clean leg is kept.
set -u
cd /root/repo
CP='target/scala-2.13/debeziumnatscdcspark_2.13-0.1.0.jar:/opt/spark/jars/*'

quiet() { # wait for a 30 s window with < 0.9 s host steal
  while :; do
    S0=$(awk '/^cpu /{print $9}' /proc/stat); sleep 30
    S1=$(awk '/^cpu /{print $9}' /proc/stat)
    D=$((S1 - S0))
    if [ "$D" -lt 90 ]; then break; fi
    echo "steal gate: ${D}cs/30s — waiting"
  done
}

run_leg() { # $1 sfdir, $2 queries, $3 out
  for attempt in 1 2 3 4 5; do
    quiet
    echo "leg $3 attempt $attempt"
    SPARK_GRAFT_SF_DIR="$1" SPARK_GRAFT_CPUS=32 \
    SPARK_GRAFT_BENCH_WAIT=900 SPARK_GRAFT_BENCH_ONLY="$2" \
    SPARK_GRAFT_BENCH_PROGRESS="${3%.json}.progress" \
      java -cp "$CP" graft.Bench > "${3%.json}.raw" 2> "${3%.json}.err"
    grep -o '{"metric".*' "${3%.json}.raw" | tail -1 > "$3"
    if python3 -c "
import json,sys
d=json.load(open('$3'))
sys.exit(0 if d.get('contaminated') is False else 1)" 2>/dev/null; then
      echo "leg $3: clean"; return 0
    fi
    echo "leg $3: contaminated, retrying"
  done
  echo "leg $3: NEVER CLEAN (kept last attempt)"
}

case "${1:-all}" in
  sf1)
    run_leg /root/repo/bench_scale/sf1 \
      "q45_hyperball_incr,q46_betweenness,q47_scc" \
      bench/r15_sf1_graph.json
    run_leg /root/repo/bench_scale/sf1 \
      "doc_html_extract,doc_url_canon,doc_robots_gate,doc_crawl_pipeline,doc_warc_parse,doc_crawl_frontier" \
      bench/r15_sf1_crawl.json
    ;;
  keepincr)
    run_leg /root/testdata/sf0.1 "doc_dedup_keep_incr" \
      bench/r15_keepincr_probe.json
    ;;
  all)
    bash "$0" keepincr
    bash "$0" sf1
    ;;
esac
