#!/bin/bash
set -x
cd /root/repo
python bench.py > /tmp/rebaseline_sf01.json 2>/tmp/rebaseline_sf01.err
echo "=== bench.py rc=$?"
python scripts/bench_scale.py > /tmp/bs_headline.log 2>&1
echo "=== headline rc=$?"
python scripts/bench_scale.py --set tpch > /tmp/bs_tpch.log 2>&1
echo "=== tpch rc=$?"
python scripts/bench_scale.py --set round4 > /tmp/bs_round4.log 2>&1
echo "=== round4 rc=$?"
python scripts/ann_sweep.py > /tmp/ann_sweep.log 2>&1
echo "=== ann rc=$?"
echo ALL_BENCH_DONE
