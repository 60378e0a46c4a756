#!/bin/bash
# Round-5 follow-up: the 0820 windows proved worker faults are
# per-(shape, packing) executable (150k exact RUNS, 150k grouped
# crashes; 0819 saw the inverse at 300k). Re-attempt the 300k exact
# dispatch a bounded number of times in a healthy window: if it lands,
# the big point gets its exact number; if it crashes again, that's
# three more documented reproductions. One TPU touch at a time behind
# the one-client lock.
cd /root/repo
L=/tmp/tpu_big300_exact.log
run() { echo "=== $(date +%m%d_%H:%M:%S) $*" >> $L; flock /tmp/prtp_tpu.lock env PRTP_TPU_LOCK_HELD=1 BENCH_DTYPE=bfloat16 "$@" >> $L 2>&1; echo "rc=$?" >> $L; }
landed() { ls results/tpu_runs/"$1"_*.json >/dev/null 2>&1; }
keep() {
    if [ -s "$2" ] && python -c 'import json,sys; json.load(open(sys.argv[1]))' "$2" 2>/dev/null; then
        cp "$2" results/tpu_runs/"$1"_$(date +%m%d_%H%M%S).json
    fi
}

# executable should already be cache-warm from the r5 session; one
# bounded warm pass in case the cache key moved
run timeout 900 python scripts/warm_cache.py --point big --attempts 1 --per_attempt 600
for i in 1 2 3; do
    landed big300_r5_exact && break
    run timeout 420 bash -c 'python bench.py --point big > /tmp/pt_big300_exact.json'
    keep big300_r5_exact /tmp/pt_big300_exact.json
    sleep 60
done
python scripts/runs_readme.py >> $L 2>&1
echo "=== big300 exact attempts done $(date +%m%d_%H:%M:%S)" >> $L
