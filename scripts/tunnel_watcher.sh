#!/bin/bash
# Round-4 tunnel watcher: probe the TPU tunnel every ~3 min; on the
# first healthy window run the ordered measurement session
# (scripts/tpu_session.sh). After a completed session, keep probing and
# refresh the headline bench each later window so the freshest verified
# number is on disk for the end-of-round driver run.
cd /root/repo
W=/tmp/tunnel_watcher.log
SESSION_DONE=/tmp/tpu_session_done
echo "watcher start $(date +%H:%M:%S)" >> $W

probe() {
    timeout 150 python bench.py --point probe > /tmp/probe_out.json 2>>$W
    local rc=$?
    tail -c 300 /tmp/probe_out.json >> $W
    [ $rc -eq 0 ] && grep -q '"ok": true' /tmp/probe_out.json
}

while true; do
    if probe; then
        echo "=== probe OK $(date +%H:%M:%S)" >> $W
        if [ ! -f $SESSION_DONE ]; then
            bash scripts/tpu_session.sh
            touch $SESSION_DONE
            if [ -s /tmp/bench_full_r4.json ]; then
                cp /tmp/bench_full_r4.json \
                   results/tpu_runs/bench_r4_session_$(date +%H%M%S).json
            fi
            echo "=== session complete $(date +%H:%M:%S)" >> $W
        else
            # refresh the driver-form artifact in a later window so the
            # freshest verified number is on disk for _last_verified()
            TS=$(date +%H%M%S)
            BENCH_DTYPE=bfloat16 BENCH_TIME_BUDGET=1200 timeout 1300 \
                python bench.py \
                > results/tpu_runs/bench_r4_refresh_$TS.json 2>>$W
            echo "refresh rc=$? $(date +%H:%M:%S)" >> $W
            grep -q '"value": null' \
                results/tpu_runs/bench_r4_refresh_$TS.json 2>/dev/null \
                && rm -f results/tpu_runs/bench_r4_refresh_$TS.json
            sleep 900
        fi
    else
        echo "probe dead $(date +%H:%M:%S)" >> $W
    fi
    sleep 170
done
