#!/bin/bash
# Saturation probe for the merged super-graph point: the committed K
# sweep (K=8 vs 16 at 20k nodes/design) saturates ~14 TFLOP/s, read as
# "HBM-gather-bound once the dispatch floor is amortized". If that is
# right, DOUBLING the per-design size (K=8 x 40k = 320k total nodes,
# same level count -> 2x the gather bytes per dispatch) should push
# achieved TFLOP/s ABOVE 14 (bigger gathers use HBM lanes better);
# if it stays ~14, the ceiling is the level-walk dispatch floor, not
# gather bandwidth. One bounded measurement; one TPU touch at a time.
cd /root/repo
L=/tmp/tpu_merged_40k.log
E="BENCH_DTYPE=bfloat16 BENCH_MERGED_NODES=40000"
run() { echo "=== $(date +%m%d_%H:%M:%S) $*" >> $L; flock /tmp/prtp_tpu.lock env PRTP_TPU_LOCK_HELD=1 $E "$@" >> $L 2>&1; echo "rc=$?" >> $L; }
keep() {
    if [ -s "$2" ] && python -c 'import json,sys; json.load(open(sys.argv[1]))' "$2" 2>/dev/null; then
        cp "$2" results/tpu_runs/"$1"_$(date +%m%d_%H%M%S).json
    fi
}

run timeout 900 python scripts/warm_cache.py --point merged --packing exact \
    --attempts 2 --per_attempt 420
run timeout 420 bash -c 'python bench.py --point merged > /tmp/pt_merged40k.json'
keep merged_r5_40k /tmp/pt_merged40k.json
python scripts/runs_readme.py >> $L 2>&1
echo "=== merged 40k probe done $(date +%m%d_%H:%M:%S)" >> $L
