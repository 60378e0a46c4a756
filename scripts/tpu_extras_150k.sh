#!/bin/bash
# Round-5 extras: exact-vs-grouped at 150k nodes (VERDICT r4 item 4).
# The 300k exact-levels DISPATCH crashes this tunnel's TPU worker
# (reproduced 3x, session log), so the exact-vs-grouped ratio is
# measured at the largest size that runs instead. One-shot; each TPU
# touch queues on the one-client lock behind the watcher's refreshes.
cd /root/repo
L=/tmp/tpu_extras_150k.log
E="BENCH_DTYPE=bfloat16 BENCH_BIG_NODES=150000 BENCH_BIG_LEVELS=26 PRTP_TPU_LOCK_HELD=1"
run() { echo "=== $(date +%m%d_%H:%M:%S) $*" >> $L; flock /tmp/prtp_tpu.lock env $E "$@" >> $L 2>&1; echo "rc=$?" >> $L; }
keep() {
    if [ -s "$2" ] && python -c 'import json,sys; json.load(open(sys.argv[1]))' "$2" 2>/dev/null; then
        cp "$2" results/tpu_runs/"$1"_$(date +%m%d_%H%M%S).json
    fi
}

landed() { ls results/tpu_runs/"$1"_*.json >/dev/null 2>&1; }
TRIES=/tmp/extras150_exact_tries
ntries() { cat $TRIES 2>/dev/null || echo 0; }

if ! landed big150_r5_exact && [ "$(ntries)" -lt 3 ]; then
    echo $(( $(ntries) + 1 )) > $TRIES
    # land the exact compile in the persistent cache first (retryable)
    run timeout 900 python scripts/warm_cache.py --point big --attempts 2 --per_attempt 420
    # exact-levels bench at 150k (short cap: the executable is cache-warm)
    run timeout 420 bash -c 'python bench.py --point big > /tmp/pt_big150_exact.json'
    keep big150_r5_exact /tmp/pt_big150_exact.json
fi
if ! landed big150_r5_grouped; then
    # grouped A/B at the same size
    run env BENCH_BIG_PACKING=grouped timeout 600 bash -c 'python bench.py --point big > /tmp/pt_big150_grouped.json'
    keep big150_r5_grouped /tmp/pt_big150_grouped.json
fi
if ! landed big150_r5_exact && [ "$(ntries)" -ge 3 ] \
        && ! landed head_r5_grouped80k; then
    # the 150k exact DISPATCH won't survive this tunnel either: take the
    # exact-vs-grouped ratio at the largest size that dispatches both —
    # the 80k headline (exact numbers abound; this lands the grouped
    # bf16 A/B at identical shapes)
    run env BENCH_HEADLINE_PACKING=grouped timeout 600 bash -c 'python bench.py --point headline > /tmp/pt_head80_grouped.json'
    keep head_r5_grouped80k /tmp/pt_head80_grouped.json
fi
python scripts/runs_readme.py >> $L 2>&1
echo "=== extras done $(date +%m%d_%H:%M:%S)" >> $L
