#!/bin/bash
# Round-4 TPU measurement session — run when the tunnel probe is green.
# Each step bounded; logs to /tmp/tpu_session.log. Order: cheapest
# evidence first, so a short window still lands something.
# NOTE: flat Adam is now the bench default (BENCH_FLAT_ADAM=1), which
# changes every point's HLO/cache key — warmed caches from earlier
# windows are stale for the new default but still serve the =0 A/B.
cd /root/repo
L=/tmp/tpu_session.log
run() { echo "=== $(date +%H:%M:%S) $*" >> $L; timeout "$@" >> $L 2>&1; echo "rc=$?" >> $L; }

# 1. headline point, bf16 exact, flat adam (the new default)
BENCH_DTYPE=bfloat16 run 900 python bench.py --point headline
# 1b. flat-adam A/B: per-leaf optax Adam (the r01-r03 optimizer)
BENCH_DTYPE=bfloat16 BENCH_FLAT_ADAM=0 run 600 python bench.py --point headline
# 1c. cross-level batched fused form (round-2 f32 REJECT, re-test in
#     bf16: hoisted self-MLPs + one bwd gather + deferred wgrads)
BENCH_DTYPE=bfloat16 PRTP_GNN_BATCHED=1 run 600 python bench.py --point headline
# 2. f32 A/B headline
BENCH_DTYPE=float32 run 600 python bench.py --point headline
# 3. grouped headline + unroll A/B
BENCH_DTYPE=bfloat16 BENCH_HEADLINE_PACKING=grouped run 600 python bench.py --point headline
BENCH_DTYPE=bfloat16 BENCH_HEADLINE_PACKING=grouped BENCH_GNN_UNROLL=0 run 600 python bench.py --point headline
# 4. merged K=8 and K=16 (warm the K=8 executable first so the bench
#    point loads it; K=16 gets a long cap for its own compile)
BENCH_DTYPE=bfloat16 run 600 python scripts/warm_cache.py --point merged --attempts 2 --per_attempt 280
BENCH_DTYPE=bfloat16 run 600 python bench.py --point merged
BENCH_DTYPE=bfloat16 BENCH_MERGED_K=16 run 900 python bench.py --point merged
# 5. big 300k: grouped, then exact (exact only if cache warm)
BENCH_DTYPE=bfloat16 BENCH_BIG_PACKING=grouped run 900 python bench.py --point big
BENCH_DTYPE=bfloat16 run 900 python scripts/warm_cache.py --point big --attempts 1 --per_attempt 850
BENCH_DTYPE=bfloat16 BENCH_BIG_PACKING=exact run 600 python bench.py --point big
# 6. full driver-form bench artifact (probe-gated, all points, JSON line)
BENCH_DTYPE=bfloat16 BENCH_TIME_BUDGET=2400 run 2500 bash -c 'python bench.py > /tmp/bench_full_r4.json'
cp /tmp/tpu_session.log /tmp/tpu_session_$(date +%H%M%S).log
# 7. PROFILE.md decomposition in bf16
BENCH_DTYPE=bfloat16 run 1500 python scripts/decompose_step.py
echo "=== session done $(date +%H:%M:%S)" >> $L
