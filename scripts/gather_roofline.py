"""Gather roofline: what the level walk's HBM gathers can achieve.

The merged-point story (MODEL_NOTES "Round-5") reads the ~14 TFLOP/s
saturation as "HBM-gather-bound once the dispatch floor is amortized".
This script turns that from a reading into arithmetic, on-device:

  stream      HBM read ceiling (sum over a large resident array)
  xla_gather  y = h[idx]            -- XLA's native dynamic gather
  xla_mm      (h[idx] @ W)          -- gather feeding the MXU (the
                                       walk's actual consumer pattern)
  pallas      one-row-per-program BlockSpec-index_map gather (the
                                       canonical Pallas embedding-gather)
  chain       lax.scan of P dependent gathers (the walk's sequential
                                       structure, launch floor included)

Shapes mirror the bench headline's exact packing (bench.build_design:
h = (~80k, 128) bf16; 10 forward gathers totaling ~129k rows/step).
Honest clocks per the round-5 integrity contract: every timed trial
ends in a scalar checksum fetch (an aborted dispatch raises, it never
times as a success); gathers are made loop-iteration-dependent so XLA
cannot hoist them out of the repeat loop.

Run under the one-TPU-client flock:
  flock /tmp/prtp_tpu.lock env PRTP_TPU_LOCK_HELD=1 \
      python scripts/gather_roofline.py > out.json
"""

import functools
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(os.environ.get("GR_N", 160_000))      # h rows (merged-scale table)
D = int(os.environ.get("GR_D", 128))          # embedding dim (bench OUT_DIM)
M = int(os.environ.get("GR_M", 129_202))      # gathered rows/step (80k pack)
P = int(os.environ.get("GR_P", 10))           # dependent gathers in the chain
REPEAT = int(os.environ.get("GR_REPEAT", 50))
TRIALS = int(os.environ.get("GR_TRIALS", 3))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def timed(fn, args, bytes_moved, label, trials=TRIALS):
    """ms per repeat-loop iteration + GB/s; scalar fetch bounds every
    trial (round-5 clock rule). Returns dict or None on failure."""
    try:
        best = None
        for i in range(trials + 1):
            t0 = time.time()
            chk = float(fn(*args))
            dt = time.time() - t0
            if not math.isfinite(chk):
                raise RuntimeError(f"{label}: non-finite checksum")
            if i == 0:
                log(f"{label}: compile+first {dt:.2f}s")
                continue  # compile trial
            ms = dt / REPEAT * 1e3
            best = ms if best is None else min(best, ms)
            log(f"{label} trial {i}: {ms:.3f} ms/iter")
        return {"label": label, "ms": round(best, 4),
                "gbps": round(bytes_moved / (best * 1e-3) / 1e9, 1)}
    except Exception as e:  # one variant failing must not kill the rest
        log(f"{label} FAILED: {type(e).__name__}: {e}")
        return {"label": label, "ms": None, "gbps": None,
                "error": f"{type(e).__name__}: {e}"}


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from prtp_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()

    dev = jax.devices()[0]
    log(f"device: {dev}")
    key = jax.random.PRNGKey(0)
    h = jax.random.normal(key, (N, D), jnp.float32).astype(jnp.bfloat16)
    idx = jax.random.randint(jax.random.PRNGKey(1), (M,), 0, N, jnp.int32)
    w = jax.random.normal(jax.random.PRNGKey(2), (D, D),
                          jnp.float32).astype(jnp.bfloat16)
    row_b = D * 2  # bf16 row bytes

    results = {"n": N, "d": D, "m": M, "repeat": REPEAT,
               "device": str(dev), "points": []}

    # --- stream: HBM read ceiling ---------------------------------
    big = jnp.ones((64 * 1024 * 1024,), jnp.float32)  # 256 MB resident

    @jax.jit
    def stream(x):
        def body(i, acc):
            return acc + (x * (1.0 + i)).sum()  # scale defeats hoisting
        return lax.fori_loop(0, REPEAT, body, 0.0)

    results["points"].append(
        timed(stream, (big,), big.nbytes, "stream_read"))

    # --- xla gather ------------------------------------------------
    @jax.jit
    def xla_gather(h, idx):
        def body(i, acc):
            rows = h[(idx + 8 * i) % N]         # iteration-dependent,
            # 8*i keeps tile alignment for aligned index sets
            return acc + rows.astype(jnp.float32).sum()
        return lax.fori_loop(0, REPEAT, body, 0.0)

    # read M rows + write M rows (gather output materializes in HBM
    # before the reduce at this size)
    results["points"].append(
        timed(xla_gather, (h, idx), 2 * M * row_b, "xla_gather"))

    # --- xla gather -> matmul (the walk's consumer pattern) --------
    @jax.jit
    def xla_mm(h, idx, w):
        def body(i, acc):
            rows = h[(idx + 8 * i) % N]
            y = jnp.matmul(rows, w, preferred_element_type=jnp.float32)
            return acc + y.sum()
        return lax.fori_loop(0, REPEAT, body, 0.0)

    results["points"].append(
        timed(xla_mm, (h, idx, w), 2 * M * row_b, "xla_gather_mm"))

    # --- pallas block-gather ----------------------------------------
    try:
        from jax.experimental import pallas as pl
        import jax.experimental.pallas.tpu as pltpu

        TILE = 256   # output rows per program
        NSEM = 16    # ring slots: 2 groups of 8 tile-copies in flight
        M2 = ((M + TILE - 1) // TILE) * TILE
        idx_p = jnp.concatenate([idx, idx[: M2 - M]]) if M2 > M else idx

        def gk(idx_ref, h_ref, o_ref, scr, sems):
            # HBM rows live in (8,128) tiles: single-row HBM slices are
            # not DMA-able (Mosaic: "slice must be aligned to tiling
            # (8)") and VMEM sublane selects must be statically
            # 8-aligned — so a Pallas gather copies each row's enclosing
            # 8-row tile (the same 8x amplification XLA's native gather
            # pays) and row-selects by masked reduce. Output rows go in
            # groups of 8 (static inner unroll) so the VMEM write is
            # provably tile-aligned; two groups of DMAs stay in flight.
            base = pl.program_id(0) * TILE
            sub = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)

            def issue(j, slot):
                r = idx_ref[base + j]
                return pltpu.make_async_copy(
                    h_ref.at[pl.ds((r // 8) * 8, 8), :],
                    scr.at[slot],
                    sems.at[slot])

            def grp_issue(g):
                for k in range(8):  # static unroll
                    issue(g * 8 + k, (g % 2) * 8 + k).start()

            grp_issue(0)
            n_grp = TILE // 8

            def body(g, _):
                @pl.when(g + 1 < n_grp)
                def _nxt():
                    grp_issue(g + 1)
                rows = []
                for k in range(8):  # static unroll
                    j = g * 8 + k
                    slot = (g % 2) * 8 + k
                    issue(j, slot).wait()
                    r = idx_ref[base + j]
                    tile = scr[slot]  # (8, D), dynamic leading index ok
                    rows.append(jnp.where(sub == r % 8, tile,
                                          jnp.zeros_like(tile)
                                          ).sum(0, keepdims=True))
                o_ref[pl.ds(g * 8, 8), :] = jnp.concatenate(rows, axis=0)
                return 0

            lax.fori_loop(0, n_grp, body, 0)

        @jax.jit
        def pallas_gather(h, idx_p):
            f = pl.pallas_call(
                gk,
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=1,
                    grid=(M2 // TILE,),
                    in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
                    out_specs=pl.BlockSpec((TILE, D),
                                           lambda i, idx_ref: (i, 0)),
                    scratch_shapes=[
                        pltpu.VMEM((NSEM, 8, D), h.dtype),
                        pltpu.SemaphoreType.DMA((NSEM,)),
                    ],
                ),
                out_shape=jax.ShapeDtypeStruct((M2, D), h.dtype),
            )

            def body(i, acc):
                y = f((idx_p + 8 * i) % N, h)
                return acc + y.astype(jnp.float32).sum()
            return lax.fori_loop(0, REPEAT, body, 0.0)

        # correctness first: the kernel must agree with XLA's gather
        ok = bool(jnp.array_equal(
            jax.jit(lambda h, i: pl.pallas_call(
                gk,
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=1,
                    grid=(M2 // TILE,),
                    in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
                    out_specs=pl.BlockSpec((TILE, D),
                                           lambda g, idx_ref: (g, 0)),
                    scratch_shapes=[
                        pltpu.VMEM((NSEM, 8, D), h.dtype),
                        pltpu.SemaphoreType.DMA((NSEM,)),
                    ],
                ),
                out_shape=jax.ShapeDtypeStruct((M2, D), h.dtype),
            )(i, h))(h, idx_p),
            h[idx_p]))
        log(f"pallas gather matches XLA gather: {ok}")
        if not ok:
            raise RuntimeError("pallas gather kernel produced wrong rows")

        results["points"].append(
            timed(pallas_gather, (h, idx_p), 2 * M2 * row_b,
                  "pallas_gather_dma"))
    except Exception as e:  # pallas import/trace failure
        log(f"pallas variant skipped: {e}")
        results["points"].append({"label": "pallas_gather_dma", "ms": None,
                                  "gbps": None, "error": str(e)})

    # --- sorted / clustered index variants ---------------------------
    # HBM rows live in (8,128) tiles: a random 1-row gather drags its
    # whole 8-row tile. If XLA exploits index locality, sorting the
    # SAME index multiset should approach stream rate; if not, the
    # amplification is per-index regardless of order.
    idx_sorted = jnp.sort(idx)
    results["points"].append(
        timed(xla_gather, (h, idx_sorted), 2 * M * row_b,
              "xla_gather_sorted"))

    # tile-aligned contiguous runs of 8: the no-amplification best case
    # a locality-aware packer could construct (same M rows gathered).
    base8 = jax.random.randint(jax.random.PRNGKey(3), (M // 8,), 0,
                               N // 8, jnp.int32) * 8
    idx_runs = (base8[:, None] + jnp.arange(8, dtype=jnp.int32)[None, :]
                ).reshape(-1)
    results["points"].append(
        timed(xla_gather, (h, idx_runs), 2 * (M // 8) * 8 * row_b,
              "xla_gather_tile_runs"))

    # --- dependent-gather chain (walk structure) --------------------
    mp = M // P

    @jax.jit
    def chain(h, idx):
        def body(i, acc):
            def level(k, carry):
                acc, off = carry
                rows = lax.dynamic_slice(idx, ((off + i) % (M - mp),), (mp,))
                g = h[rows % N]
                return (acc + g.astype(jnp.float32).sum(), off + mp)
            acc, _ = lax.fori_loop(0, P, level, (acc, 0))
            return acc
        return lax.fori_loop(0, REPEAT, body, 0.0)

    results["points"].append(
        timed(chain, (h, idx), 2 * M * row_b, f"chain_{P}_dependent"))

    print(json.dumps(results))


if __name__ == "__main__":
    if os.environ.get("PRTP_TPU_LOCK_HELD") != "1":
        log("refusing to touch the TPU without the client lock; run "
            "under: flock /tmp/prtp_tpu.lock env PRTP_TPU_LOCK_HELD=1 ...")
        sys.exit(2)
    main()
