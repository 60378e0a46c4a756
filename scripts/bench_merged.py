"""Measure merged super-graph multi-design throughput vs single-design.

VERDICT r1 item 6 acceptance: at 4 stacked designs the merged layout
must deliver >= 0.8x the single-design steps/s*design. The vmapped
round-1 path measured ~0.35x (vmap lowers the per-level DUS writes to
scatters); `graph.merge_parsed_designs` instead unions the K designs'
levels into one disjoint DAG so one shared level scan propagates all
designs with contiguous writes.

Prints one JSON line:
  {"single_sps": S1, "merged_sps": S4, "designs": K,
   "design_steps_per_sec_ratio": K*S4/S1}
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NODES_PER_DESIGN = int(os.environ.get("BM_NODES", 20_000))
NUM_LEVELS = int(os.environ.get("BM_LEVELS", 20))
K = int(os.environ.get("BM_K", 4))
BATCH = int(os.environ.get("BM_BATCH", 256))
MAP_SIZE = int(os.environ.get("BM_MAP", 128))
CNN_HW = int(os.environ.get("BM_CNN_HW", 512))
STEPS = int(os.environ.get("BM_STEPS", 30))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _measure(step, state, design, ids, mask, trials=3):
    import math
    t0 = time.time()
    state, mets = step(state, design, ids, mask)
    loss = float(mets["loss"])  # real fetch: an aborted dispatch raises
    log(f"  compile+first dispatch: {time.time() - t0:.1f}s "
        f"loss={loss:.3f}")
    best = 0.0
    for _ in range(trials):
        t0 = time.time()
        state, mets = step(state, design, ids, mask)
        loss = float(mets["loss"])  # bounds the timed region
        if not math.isfinite(loss):
            raise RuntimeError(f"non-finite loss {loss}")
        best = max(best, STEPS / (time.time() - t0))
    return best


def main():
    import bench
    _lock = bench._acquire_tpu_lock()  # noqa: F841 — one TPU client

    import jax
    from prtp_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    from prtp_tpu.data.random_design import bench_level_sizes, make_random_design
    from prtp_tpu.graph import merge_parsed_designs, pack_design
    from prtp_tpu.models import PathModel
    from prtp_tpu.trainer import (init_state, make_multi_train_step,
                                  make_optimizer, pad_batch)

    sizes = bench_level_sizes(NODES_PER_DESIGN, NUM_LEVELS, decay=0.8)
    parsed_list = [
        make_random_design(sizes, map_size=MAP_SIZE, cnn_hw=CNN_HW,
                           mask_nnz_per_path=96, seed=100 + i)
        for i in range(K)
    ]
    model = PathModel(out_dim=128, hidden_dim=256, cnn_outdim=128,
                      map_size=MAP_SIZE)
    tx = make_optimizer(1e-3)
    step = make_multi_train_step(model, tx, STEPS, "reg")

    # ---- single design ----
    p0 = parsed_list[0]
    d1 = pack_design(p0, map_size=MAP_SIZE, exact_levels=True)
    st1 = init_state(model, tx, d1, jax.random.PRNGKey(0))
    b = min(BATCH, d1.num_paths)
    rng = np.random.default_rng(0)
    ids1, mask1 = pad_batch(
        rng.permutation(d1.num_paths)[:b].astype(np.int64), b)
    log(f"single design: {p0['num_nodes']} nodes, {p0['num_paths']} paths")
    s1 = _measure(step, st1, d1, ids1, mask1)
    log(f"single-design: {s1:.2f} steps/s")

    # ---- merged K designs ----
    merged = merge_parsed_designs(parsed_list)
    dk = pack_design(merged, map_size=MAP_SIZE, exact_levels=True)
    stk = init_state(model, tx, dk, jax.random.PRNGKey(0))
    idsk = np.zeros((K, b), np.int32)
    maskk = np.zeros((K, b), np.float32)
    for i, uni in enumerate(merged["path_ids_per_design"]):
        uni = np.asarray(uni)
        take = uni[rng.permutation(len(uni))[:b]]
        idsk[i, :len(take)] = take
        maskk[i, :len(take)] = 1.0
    import jax.numpy as jnp
    log(f"merged: {merged['num_nodes']} nodes, {K} designs")
    sk = _measure(step, stk, dk, jnp.asarray(idsk), jnp.asarray(maskk))
    ratio = K * sk / s1
    log(f"merged: {sk:.2f} steps/s -> {K * sk:.2f} design-steps/s "
        f"({ratio:.2f}x single)")
    print(json.dumps({
        "single_sps": round(s1, 2), "merged_sps": round(sk, 2),
        "designs": K, "design_steps_per_sec_ratio": round(ratio, 2)}))


if __name__ == "__main__":
    main()
