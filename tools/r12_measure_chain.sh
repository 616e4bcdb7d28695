#!/bin/bash
# Round-12 serialized measurement chain — run with NOTHING else on the
# box (timing artifacts are contention-sensitive; the r11 post-mortem
# and the BENCHNOTES.md root-cause study both trace recorded slowdowns
# to contaminated windows).  SPARK_GRAFT_DRIVER_MEM=16g is exported
# for the WHOLE chain: measured this round (tools/r12_slowdown_bisect,
# BENCHNOTES.md) that 8g vs 16g makes no timing difference, and the
# recurring 64x SCALE fixture (d28 sort-merge) OOMs below 16g.
#
# Order: tier-12 data-scaling artifact (SCALE_r12.json: iterative tier
# + s23 candidate accounting + d28 stage attribution) ran FIRST this
# round (it feeds SCALE.md dispositions), then plan audit (regenerates
# PLANS.md, exits 1 on an anti-pattern), then bench (BENCH_LOCAL_r12 —
# first artifact on the v2 per-shape calibration panel).
set -x
cd /root/repo
export SPARK_GRAFT_DRIVER_MEM=16g
python tools/tier12_scale.py /root/testdata/sf0.1 SCALE_r12.json > /tmp/tier12_scale.log 2>&1
echo "tier12 exit: $?"
python tools/plan_audit.py > /tmp/plan_audit_r12.log 2>&1
echo "plan_audit exit: $?"
python bench.py > /tmp/bench_r12.log 2>&1
echo "bench exit: $?"
