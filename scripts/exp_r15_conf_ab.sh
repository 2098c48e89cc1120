#!/bin/bash
# Round-15 config A/B: run the headline bench (3 runs/query) under
# candidate session configs via SPARK_GRAFT_EXTRA_CONF, one process per
# config so each gets a fresh JVM. Results land in
# scripts/conf_ab_<tag>.json (stdout line) for side-by-side comparison.
set -u
cd "$(dirname "$0")/.."
export SPARK_GRAFT_SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}"
export SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}"
export SPARK_GRAFT_BENCH_RUNS=3

run_one() {
  local tag="$1"; shift
  local conf="$1"; shift
  echo "=== $tag: $conf" >&2
  SPARK_GRAFT_EXTRA_CONF="$conf" python bench.py \
    > "scripts/conf_ab_${tag}.json" 2>/dev/null
  cp bench_detail_last.json "scripts/conf_ab_${tag}_detail.json"
  python - "$tag" <<'EOF'
import json, sys
d = json.load(open(f"scripts/conf_ab_{sys.argv[1]}.json"))
print(f"{sys.argv[1]}: total={d['value']} anchor={d['anchor']}")
EOF
}

run_one baseline ""
run_one zstd "spark.io.compression.codec=zstd"
run_one shj "spark.sql.join.preferSortMergeJoin=false"
run_one zstd_shj "spark.io.compression.codec=zstd;spark.sql.join.preferSortMergeJoin=false"
