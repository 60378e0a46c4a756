#!/bin/bash
# 300k grouped SCAN_GROUPS sweep: the committed big point (grouped,
# N=6) costs 62 ms/step while the 150k exact point costs 20 ms — 3.1x
# the time for 2x the nodes, i.e. the N=6 padding burns real compute at
# 300k's deeper level profile. The auto-chooser (N=0: smallest N whose
# padded compute is within 15% of exact) and a denser N=12 are new
# executables (exact-unroll stays untouchable: its dispatch faults the
# worker, 7 reproductions). Bounded; one TPU touch at a time.
cd /root/repo
L=/tmp/tpu_big300_groups.log
run() { echo "=== $(date +%m%d_%H:%M:%S) $*" >> $L; flock /tmp/prtp_tpu.lock env PRTP_TPU_LOCK_HELD=1 BENCH_DTYPE=bfloat16 "$@" >> $L 2>&1; echo "rc=$?" >> $L; }
keep() {
    if [ -s "$2" ] && python -c 'import json,sys; json.load(open(sys.argv[1]))' "$2" 2>/dev/null; then
        cp "$2" results/tpu_runs/"$1"_$(date +%m%d_%H%M%S).json
    fi
}

for N in 0 12; do
    OUT=/tmp/pt_big300_g$N.json
    run env BENCH_SCAN_GROUPS=$N timeout 900 python scripts/warm_cache.py \
        --point big --packing grouped --attempts 2 --per_attempt 420
    run env BENCH_SCAN_GROUPS=$N BENCH_BIG_PACKING=grouped timeout 420 \
        bash -c "python bench.py --point big > $OUT"
    keep big300_r5_groups$N $OUT
done
python scripts/runs_readme.py >> $L 2>&1
echo "=== big300 groups sweep done $(date +%m%d_%H:%M:%S)" >> $L
