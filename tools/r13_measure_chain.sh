#!/bin/bash
# Round-13 serialized measurement chain — run with NOTHING else on the
# box (timing artifacts are contention-sensitive; see BENCHNOTES.md).
# SPARK_GRAFT_DRIVER_MEM=16g for the whole chain: 8g vs 16g measured
# identical (r12 bisect), and the 64x d28 SCALE fixture OOMs below 16g.
#
# NEW in r13 (verdict ask #8): a box-health PREFLIGHT before each
# timing stage.  BENCHNOTES documents sporadic multi-second
# kcompactd/khugepaged stalls (one e9 pass hit 35.1 s on an idle VM);
# the probe times a fixed single-threaded copy+reduce workload 3x and
# blocks until the max/min spread is under 2.5x (10 attempts, 30 s
# apart), so a stalled window delays the chain instead of
# contaminating the recording.  bench.py additionally records its own
# pre/post probe inside the artifact (out["box_probe"]).
#
# Order: tier-13 scaling artifact first (SCALE_r13.json: s24-under-cap
# re-measure, d28 suffix-filter stage attribution, s26 serving table),
# then plan audit (regenerates PLANS.md, exits 1 on an anti-pattern),
# then bench (BENCH_LOCAL_r13 — first round-over-round headline-b
# comparison, min-of-5 now covering the whole <3 s tier).
set -x
cd /root/repo
export SPARK_GRAFT_DRIVER_MEM=16g

preflight () {
  python - <<'EOF'
import json, sys, time
sys.path.insert(0, "/root/repo")
from bench import box_probe
for attempt in range(10):
    p = box_probe()
    print(json.dumps({"preflight_attempt": attempt, **p}), flush=True)
    if p["spread"] < 2.5:
        sys.exit(0)
    time.sleep(30)
print("preflight: box still unstable after 10 attempts — proceeding, "
      "artifact flagged by its own embedded probe", flush=True)
EOF
}

preflight
python tools/tier13_scale.py /root/testdata/sf0.1 SCALE_r13.json > /tmp/tier13_scale.log 2>&1
echo "tier13 exit: $?"
python tools/plan_audit.py > /tmp/plan_audit_r13.log 2>&1
echo "plan_audit exit: $?"
preflight
python bench.py > /tmp/bench_r13.log 2>&1
echo "bench exit: $?"
