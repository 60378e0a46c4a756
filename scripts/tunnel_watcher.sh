#!/bin/bash
# Round-5 tunnel watcher: probe the TPU tunnel every ~3 min; on the
# first healthy window run the ordered measurement session
# (scripts/tpu_session.sh). After a completed session, keep probing and
# refresh the headline bench each later window so the freshest verified
# number is on disk for the end-of-round driver run.
cd /root/repo
W=/tmp/tunnel_watcher.log
SESSION_DONE=/tmp/tpu_session_done
SESSION_EVIDENCE=/tmp/bench_full_r5.json
# ONE TPU client at a time: two concurrent clients on this
# tunnel-backed chip crash the TPU worker ("kernel fault"); every TPU
# touch — probe, session, refresh, and any ad-hoc run — must hold this
# lock (flock blocks until free).
TPU_LOCK=/tmp/prtp_tpu.lock
echo "watcher start $(date +%m%d_%H:%M:%S)" >> $W

probe() {
    # PRTP_TPU_LOCK_HELD: bench.py itself acquires this flock unless
    # told a parent already holds it (deadlock otherwise — flock is
    # per-open-file-description)
    PRTP_TPU_LOCK_HELD=1 flock $TPU_LOCK timeout 150 \
        python bench.py --point probe > /tmp/probe_out.json 2>>$W
    local rc=$?
    tail -c 300 /tmp/probe_out.json >> $W
    [ $rc -eq 0 ] && grep -q '"ok": true' /tmp/probe_out.json
}

valid_json() {
    python -c 'import json,sys; json.load(open(sys.argv[1]))' "$1" 2>/dev/null
}

while true; do
    if probe; then
        echo "=== probe OK $(date +%m%d_%H:%M:%S)" >> $W
        if [ ! -f $SESSION_DONE ]; then
            bash scripts/tpu_session.sh
            # gate completion on evidence: the driver-form artifact must
            # exist, parse, AND carry a real headline — a dead-tunnel
            # session emits a well-formed {"value": null, ...} line with
            # rc 0, which must NOT count as done (retry next window)
            if [ -s $SESSION_EVIDENCE ] && valid_json $SESSION_EVIDENCE \
                    && ! grep -q '"value": null' $SESSION_EVIDENCE; then
                touch $SESSION_DONE
                cp $SESSION_EVIDENCE \
                   results/tpu_runs/bench_r5_session_$(date +%m%d_%H%M%S).json
                python scripts/runs_readme.py >> $W 2>&1
                echo "=== session complete $(date +%m%d_%H:%M:%S)" >> $W
            else
                echo "=== session INCOMPLETE (no valid $SESSION_EVIDENCE);" \
                     "will retry next window" >> $W
            fi
        else
            # refresh the driver-form artifact in a later window so the
            # freshest verified number is on disk for _last_verified()
            TS=$(date +%m%d_%H%M%S)
            OUT=results/tpu_runs/bench_r5_refresh_$TS.json
            BENCH_DTYPE=bfloat16 BENCH_TIME_BUDGET=1200 \
                PRTP_TPU_LOCK_HELD=1 flock $TPU_LOCK timeout 1300 \
                python bench.py > $OUT 2>>$W
            echo "refresh rc=$? $(date +%m%d_%H:%M:%S)" >> $W
            # keep only intact, non-null artifacts: a timeout-killed run
            # leaves a truncated file; a dead tunnel leaves value:null
            if ! valid_json $OUT || grep -q '"value": null' $OUT; then
                rm -f $OUT
            else
                python scripts/runs_readme.py >> $W 2>&1
            fi
            sleep 900
        fi
    else
        echo "probe dead $(date +%m%d_%H:%M:%S)" >> $W
    fi
    sleep 170
done
