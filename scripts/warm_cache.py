"""Warm the persistent XLA compile cache for a bench point's train step.

The exact-levels unroll of a 300k-node/26-level design costs minutes of
XLA compile; this container's TPU tunnel repeatedly kills that RPC
(`UNAVAILABLE` mid-compile, 5/5 attempts across rounds 2-3), so the
fastest packing has never been *measured* at that size. The compile is
idempotent and cached (`prtp_tpu.utils.cache`): once ONE attempt lands,
every later run — including `bench.py`'s big point with
`BENCH_BIG_PACKING=exact` — loads the executable in seconds.

This script makes the compile itself retryable: each attempt runs in a
fresh subprocess (a poisoned PJRT client never outlives its attempt)
with a wall-clock cap, until the compile lands or attempts run out.
The workload is built by importing bench.py's own builders, so shapes,
seeds and the multi-step dispatch match the bench point exactly —
same HLO, same cache key.

Usage:
  python scripts/warm_cache.py                 # bench big point, exact
  python scripts/warm_cache.py --point headline
  python scripts/warm_cache.py --attempts 8 --per_attempt 1200
Env: the same BENCH_* overrides bench.py honors (BENCH_DTYPE included).
"""

import argparse
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _attempt(point, packing):
    """One compile attempt, in-process (run inside a child).

    Uses bench.build_point_step — the ONE place the point's shapes,
    seeds and step construction live — so the compiled HLO (and the
    persistent-cache key) is identical to what the bench point runs.
    """
    import bench
    import jax

    _lock = bench._acquire_tpu_lock()  # noqa: F841 — one TPU client
    if point == "merged":
        design, state, step, ids, mask = bench.build_merged_step(
            packing=packing)
    else:
        if point == "big":
            parsed, _ = bench.build_design(bench.BIG_NODES,
                                           bench.BIG_LEVELS, seed=11)
        else:
            parsed, _ = bench.build_design()
        (_model, design, state, step,
         ids, mask, _batch) = bench.build_point_step(parsed, packing)
    t0 = time.time()
    # compile WITHOUT dispatching a step (no timing, no training state
    # mutation): lower+compile populates the persistent cache.
    step.lower(state, design, ids, mask).compile()
    print(f"compile: {time.time() - t0:.1f}s "
          f"backend={jax.default_backend()}", file=sys.stderr)
    print("WARMED")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--point", default="big",
                    choices=["big", "headline", "merged"])
    ap.add_argument("--packing", default="exact",
                    choices=["exact", "grouped", "scan"])
    ap.add_argument("--attempts", type=int, default=4)
    ap.add_argument("--per_attempt", type=float, default=1500.0,
                    help="seconds cap per compile attempt")
    ap.add_argument("--child", action="store_true", help=argparse.SUPPRESS)
    args = ap.parse_args()

    if args.child:
        _attempt(args.point, args.packing)
        return

    cmd = [sys.executable, os.path.abspath(__file__), "--child",
           "--point", args.point, "--packing", args.packing]
    for i in range(args.attempts):
        print(f"--- warm attempt {i + 1}/{args.attempts} "
              f"(cap {args.per_attempt:.0f}s) ---", file=sys.stderr)
        try:
            proc = subprocess.run(cmd, timeout=args.per_attempt,
                                  stdout=subprocess.PIPE)
        except subprocess.TimeoutExpired:
            print("attempt timed out", file=sys.stderr)
            continue
        if proc.returncode == 0 and b"WARMED" in proc.stdout:
            print(f"cache warmed for {args.point}/{args.packing}")
            return
        print(f"attempt failed rc={proc.returncode}", file=sys.stderr)
    print("cache NOT warmed (all attempts failed)", file=sys.stderr)
    sys.exit(1)


if __name__ == "__main__":
    main()
