#!/bin/bash
# Round-5 extras: exact-vs-grouped at 150k nodes (VERDICT r4 item 4).
# The 300k exact-levels DISPATCH crashes this tunnel's TPU worker
# (reproduced 3x, session log), so the exact-vs-grouped ratio is
# measured at the largest size that runs instead. One-shot; each TPU
# touch queues on the one-client lock behind the watcher's refreshes.
cd /root/repo
L=/tmp/tpu_extras_150k.log
E="BENCH_DTYPE=bfloat16 BENCH_BIG_NODES=150000 BENCH_BIG_LEVELS=26"
run() { echo "=== $(date +%m%d_%H:%M:%S) $*" >> $L; flock /tmp/prtp_tpu.lock env $E "$@" >> $L 2>&1; echo "rc=$?" >> $L; }
keep() {
    if [ -s "$2" ] && python -c 'import json,sys; json.load(open(sys.argv[1]))' "$2" 2>/dev/null; then
        cp "$2" results/tpu_runs/"$1"_$(date +%m%d_%H%M%S).json
    fi
}

landed() { ls results/tpu_runs/big150_r5_"$1"_*.json >/dev/null 2>&1; }

if ! landed exact; then
    # land the exact compile in the persistent cache first (retryable)
    run timeout 900 python scripts/warm_cache.py --point big --attempts 2 --per_attempt 420
    # exact-levels bench at 150k (short cap: the executable is cache-warm)
    run timeout 420 bash -c 'python bench.py --point big > /tmp/pt_big150_exact.json'
    keep big150_r5_exact /tmp/pt_big150_exact.json
fi
if ! landed grouped; then
    # grouped A/B at the same size
    run env BENCH_BIG_PACKING=grouped timeout 600 bash -c 'python bench.py --point big > /tmp/pt_big150_grouped.json'
    keep big150_r5_grouped /tmp/pt_big150_grouped.json
fi
python scripts/runs_readme.py >> $L 2>&1
echo "=== extras done $(date +%m%d_%H:%M:%S)" >> $L
