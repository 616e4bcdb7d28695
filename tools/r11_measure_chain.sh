#!/bin/bash
# Round-11 serialized measurement chain — run with NOTHING else on the
# box (timing artifacts are contention-sensitive; the first r11
# tier-scale attempt was contaminated by concurrent test runs and
# discarded).  Order: plan audit (regenerates PLANS.md, exits 1 on an
# anti-pattern), bench (BENCH_LOCAL_r11 + headline JSON), tier-11
# data-scaling artifact (SCALE_r11.json).
set -x
cd /root/repo
python tools/plan_audit.py > /tmp/plan_audit_r11.log 2>&1
echo "plan_audit exit: $?"
python bench.py > /tmp/bench_r11.log 2>&1
echo "bench exit: $?"
python tools/tier11_scale.py /root/testdata/sf0.1 SCALE_r11.json > /tmp/tier11_scale.log 2>&1
echo "tier11 exit: $?"
# NOTE (r11 post-mortem): the first chain run omitted
# SPARK_GRAFT_DRIVER_MEM=16g — the recurring SCALE fixture's heap —
# so d28's 64x sort-merge run OOM'd at the default 8g.  The tier-11
# artifact was re-run standalone with the env var set; future chains
# must export it:
#   SPARK_GRAFT_DRIVER_MEM=16g python tools/tier11_scale.py ...
