#!/bin/bash
# Round-5 TPU measurement session — run when the tunnel probe is green.
# Each step bounded; logs to /tmp/tpu_session.log. Order: cheapest /
# most-load-bearing evidence first, so a short window still lands the
# round-5 gate items (honest merged point, honest PROFILE.md, f32 A/B).
cd /root/repo
L=/tmp/tpu_session.log
# every TPU touch holds the one-client lock (see tunnel_watcher.sh)
run() { echo "=== $(date +%m%d_%H:%M:%S) $*" >> $L; flock /tmp/prtp_tpu.lock env PRTP_TPU_LOCK_HELD=1 timeout "$@" >> $L 2>&1; echo "rc=$?" >> $L; }
keep() {  # keep <name> <file>: preserve a child-point JSON artifact
    if [ -s "$2" ] && python -c 'import json,sys; json.load(open(sys.argv[1]))' "$2" 2>/dev/null; then
        cp "$2" results/tpu_runs/"$1"_$(date +%m%d_%H%M%S).json
    fi
}

# 1. headline point, bf16 exact (the default config of record)
BENCH_DTYPE=bfloat16 run 900 bash -c 'python bench.py --point headline > /tmp/pt_head.json'
keep head_r5 /tmp/pt_head.json
# 2. f32 A/B headline (VERDICT r4 missing #4)
BENCH_DTYPE=float32 run 600 bash -c 'python bench.py --point headline > /tmp/pt_head_f32.json'
keep head_r5_f32 /tmp/pt_head_f32.json
# (step 2b, the PRTP_GNN_BATCHED A/B, is retired: the lever was
#  measured at parity and DELETED per the promote-or-delete rule —
#  commit 98e5efa — so the env var no longer selects anything and the
#  run would just re-measure the default config under a "batched" name)
# 3. merged K=8 — the utilization figure (honest clocks, r5 gate)
BENCH_DTYPE=bfloat16 run 600 bash -c 'python bench.py --point merged > /tmp/pt_merged.json'
keep merged_r5 /tmp/pt_merged.json
# 4. PROFILE.md decomposition in bf16 (honest clocks, r5 gate)
BENCH_DTYPE=bfloat16 run 900 python scripts/decompose_step.py
# 5. big 300k: exact warm-cache attempt, then exact bench, then grouped A/B
BENCH_DTYPE=bfloat16 run 900 python scripts/warm_cache.py --point big --attempts 1 --per_attempt 850
BENCH_DTYPE=bfloat16 BENCH_BIG_PACKING=exact run 600 bash -c 'python bench.py --point big > /tmp/pt_big_exact.json'
keep big_r5_exact /tmp/pt_big_exact.json
BENCH_DTYPE=bfloat16 BENCH_BIG_PACKING=grouped run 900 bash -c 'python bench.py --point big > /tmp/pt_big_grouped.json'
keep big_r5_grouped /tmp/pt_big_grouped.json
# 6. full driver-form bench artifact (probe-gated, all points, JSON line)
BENCH_DTYPE=bfloat16 BENCH_TIME_BUDGET=2400 run 2500 bash -c 'python bench.py > /tmp/bench_full_r5.json'
cp /tmp/tpu_session.log /tmp/tpu_session_$(date +%m%d_%H%M%S).log
echo "=== session done $(date +%m%d_%H:%M:%S)" >> $L
