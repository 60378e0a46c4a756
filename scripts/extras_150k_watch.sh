#!/bin/bash
# Retry wrapper for tpu_extras_150k.sh: probe the tunnel (under the
# one-client lock), run the extras body in healthy windows, and exit
# once BOTH 150k artifacts (exact + grouped) have landed. Bounded.
cd /root/repo
W=/tmp/extras150_watch.log
DEADLINE=$(( $(date +%s) + ${EXTRAS_BUDGET_S:-10800} ))
echo "extras watch start $(date +%m%d_%H:%M:%S)" >> $W

landed() { ls results/tpu_runs/"$1"_*.json >/dev/null 2>&1; }
done_enough() {
    landed big150_r5_grouped || return 1
    landed big150_r5_exact && return 0
    # after 3 failed exact tries the 80k grouped headline A/B stands in
    [ "$(cat /tmp/extras150_exact_tries 2>/dev/null || echo 0)" -ge 3 ] \
        && landed head_r5_grouped80k
}

while [ "$(date +%s)" -lt "$DEADLINE" ]; do
    if done_enough; then
        echo "extras evidence landed $(date +%m%d_%H:%M:%S)" >> $W
        exit 0
    fi
    if PRTP_TPU_LOCK_HELD=1 flock /tmp/prtp_tpu.lock timeout 150 \
            python bench.py --point probe > /tmp/probe150.json 2>>$W \
            && grep -q '"ok": true' /tmp/probe150.json; then
        echo "probe OK -> extras $(date +%m%d_%H:%M:%S)" >> $W
        bash scripts/tpu_extras_150k.sh
    else
        echo "probe dead $(date +%m%d_%H:%M:%S)" >> $W
    fi
    sleep 200
done
echo "extras watch deadline $(date +%m%d_%H:%M:%S)" >> $W
exit 1
