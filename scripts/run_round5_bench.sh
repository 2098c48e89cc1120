#!/bin/bash
# Round-5 bench + evidence protocol (run each leg ALONE — concurrent
# Spark jobs distort timings; see the measured contamination note in
# BASELINE.md's round-6 section: a concurrent check inflated minhash
# 2.6->7.4 s and cosine_topk 0.58->1.9 s in an otherwise-idle run).
set -x
cd /root/repo

# scale data (idempotent, deterministic)
[ -d .localdata/sf1 ] || python scripts/gen_scale_data.py
[ -d .localdata/skew ] || python scripts/gen_scale_data.py --skew
[ -d .localdata/skewnl ] || python scripts/gen_scale_data.py --skew-nl

python bench.py > /tmp/headline_sf01.json 2>/tmp/headline_sf01.err
echo "=== bench.py rc=$?"
python scripts/bench_scale.py > /tmp/bs_headline.log 2>&1
echo "=== headline rc=$?"
python scripts/bench_scale.py --set tpch > /tmp/bs_tpch.log 2>&1
echo "=== tpch rc=$?"
python scripts/bench_scale.py --set round4 > /tmp/bs_round4.log 2>&1
echo "=== round4 rc=$?"
python scripts/bench_scale.py --set round5 > /tmp/bs_round5.log 2>&1
echo "=== round5 rc=$?"
python scripts/ann_sweep.py > /tmp/ann_sweep.log 2>&1
echo "=== ann rc=$?"
python scripts/dev_diff.py /root/testdata/sf0.01 \
  > scripts/evidence_dev_diff_r05_sf0.01.txt 2>/tmp/evidence.err
echo "=== evidence rc=$?"
echo ALL_BENCH_DONE
