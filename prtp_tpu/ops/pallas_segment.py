"""Pallas TPU kernels: fused one-pass segment reductions.

The GNN's hot reduce is the mailbox softmax-weighted sum
(``segment_softmax_sum``), which in pure XLA costs a segment-max plus
two segment-sums (three scatter passes over the edge array). With the
per-level edge tables sorted by destination slot (done at pack time),
the whole reduction is a single streaming pass: an *online softmax*
(flash-attention style running (max, denom, numer) with rescaling),
flushing a segment's row whenever the destination id changes.

Forward runs as one Pallas kernel per level half; the backward is plain
XLA gathers + elementwise math via ``jax.custom_vjp`` using the closed
form d/dx_e [sum_i softmax(x)_i x_i] = w_e (1 + x_e - y).

Correctness contract (matches prtp_tpu.ops.segment.segment_softmax_sum):
  - ``dst_slot`` sorted ascending; padded edges carry the dummy id
    ``num_segments - 1``.
  - empty segments produce zero rows.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _softmax_fwd_kernel(dst_ref, msg_ref, out_ref, denom_ref, segmax_ref,
                        m_s, d_s, n_s, cur_s):
    """Single-program streaming kernel over all E edges.

    Scratch: m_s/d_s/n_s (1, D) running online-softmax state, cur_s (1,)
    SMEM current segment id.
    """
    e_total = msg_ref.shape[0]
    d = msg_ref.shape[1]

    out_ref[:] = jnp.zeros_like(out_ref)
    denom_ref[:] = jnp.zeros_like(denom_ref)
    segmax_ref[:] = jnp.zeros_like(segmax_ref)
    m_s[:] = jnp.full((1, d), -jnp.inf, dtype=m_s.dtype)
    d_s[:] = jnp.zeros((1, d), dtype=d_s.dtype)
    n_s[:] = jnp.zeros((1, d), dtype=n_s.dtype)
    cur_s[0] = dst_ref[0, 0]

    def flush():
        seg = cur_s[0]
        m = m_s[0, :]
        dd = d_s[0, :]
        nn = n_s[0, :]
        out_ref[pl.ds(seg, 1), :] = (nn / jnp.maximum(dd, 1e-12))[None, :]
        denom_ref[pl.ds(seg, 1), :] = dd[None, :]
        segmax_ref[pl.ds(seg, 1), :] = jnp.where(
            jnp.isfinite(m), m, 0.0)[None, :]

    def body(e, _):
        sid = dst_ref[e, 0]

        @pl.when(sid != cur_s[0])
        def _():
            flush()
            m_s[:] = jnp.full((1, d), -jnp.inf, dtype=m_s.dtype)
            d_s[:] = jnp.zeros((1, d), dtype=d_s.dtype)
            n_s[:] = jnp.zeros((1, d), dtype=n_s.dtype)
            cur_s[0] = sid

        v = msg_ref[pl.ds(e, 1), :]  # (1, D)
        m_old = m_s[:]
        m_new = jnp.maximum(m_old, v)
        scale = jnp.exp(m_old - m_new)
        scale = jnp.where(jnp.isfinite(scale), scale, 0.0)
        ev = jnp.exp(v - m_new)
        d_s[:] = d_s[:] * scale + ev
        n_s[:] = n_s[:] * scale + ev * v
        m_s[:] = m_new
        return 0

    jax.lax.fori_loop(0, e_total, body, 0)
    flush()


def _softmax_fwd(msg, dst_slot, num_segments, interpret=False):
    e, d = msg.shape
    dst2d = dst_slot.reshape(e, 1).astype(jnp.int32)
    out_shape = (
        jax.ShapeDtypeStruct((num_segments, d), msg.dtype),
        jax.ShapeDtypeStruct((num_segments, d), msg.dtype),
        jax.ShapeDtypeStruct((num_segments, d), msg.dtype),
    )
    return pl.pallas_call(
        _softmax_fwd_kernel,
        out_shape=out_shape,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((1, d), msg.dtype),
            pltpu.VMEM((1, d), msg.dtype),
            pltpu.VMEM((1, d), msg.dtype),
            pltpu.SMEM((1,), jnp.int32),
        ],
        interpret=interpret,
    )(dst2d, msg)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def segment_softmax_sum_pallas(msg, dst_slot, num_segments,
                               interpret=False):
    """Fused mailbox-softmax reduce; requires dst_slot sorted ascending."""
    out, _denom, _segmax = _softmax_fwd(msg, dst_slot, num_segments,
                                        interpret)
    return out


def _ssp_fwd(msg, dst_slot, num_segments, interpret):
    out, denom, segmax = _softmax_fwd(msg, dst_slot, num_segments, interpret)
    return out, (msg, dst_slot, out, denom, segmax)


def _ssp_bwd(num_segments, interpret, res, g):
    msg, dst_slot, out, denom, segmax = res
    # w_e = exp(x_e - m_s) / d_s ;  dL/dx_e = g_s * w_e * (1 + x_e - y_s)
    m = segmax[dst_slot]
    dd = jnp.maximum(denom[dst_slot], 1e-12)
    w = jnp.exp(msg - m) / dd
    grad = g[dst_slot] * w * (1.0 + msg - out[dst_slot])
    return grad, None


segment_softmax_sum_pallas.defvjp(_ssp_fwd, _ssp_bwd)


# ------------------------------------------------------- mean variant

def _mean_fwd_kernel(dst_ref, msg_ref, out_ref, count_ref, s_s, c_s, cur_s):
    e_total = msg_ref.shape[0]
    d = msg_ref.shape[1]
    out_ref[:] = jnp.zeros_like(out_ref)
    count_ref[:] = jnp.zeros_like(count_ref)
    s_s[:] = jnp.zeros((1, d), dtype=s_s.dtype)
    c_s[0] = 0
    cur_s[0] = dst_ref[0, 0]

    def flush():
        seg = cur_s[0]
        cnt = jnp.maximum(c_s[0], 1)
        out_ref[pl.ds(seg, 1), :] = (s_s[0, :]
                                     / cnt.astype(s_s.dtype))[None, :]
        count_ref[pl.ds(seg, 1), :] = jnp.full(
            (1, count_ref.shape[1]), c_s[0], dtype=count_ref.dtype)

    def body(e, _):
        sid = dst_ref[e, 0]

        @pl.when(sid != cur_s[0])
        def _():
            flush()
            s_s[:] = jnp.zeros((1, d), dtype=s_s.dtype)
            c_s[0] = 0
            cur_s[0] = sid

        s_s[:] = s_s[:] + msg_ref[pl.ds(e, 1), :]
        c_s[0] = c_s[0] + 1
        return 0

    jax.lax.fori_loop(0, e_total, body, 0)
    flush()


def _mean_fwd(msg, dst_slot, num_segments, interpret=False):
    e, d = msg.shape
    dst2d = dst_slot.reshape(e, 1).astype(jnp.int32)
    out_shape = (
        jax.ShapeDtypeStruct((num_segments, d), msg.dtype),
        jax.ShapeDtypeStruct((num_segments, 8), jnp.int32),
    )
    return pl.pallas_call(
        _mean_fwd_kernel,
        out_shape=out_shape,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((1, d), msg.dtype),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SMEM((1,), jnp.int32),
        ],
        interpret=interpret,
    )(dst2d, msg)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def segment_mean_pallas(msg, dst_slot, num_segments, interpret=False):
    """Fused mean reduce; requires dst_slot sorted ascending."""
    out, _count = _mean_fwd(msg, dst_slot, num_segments, interpret)
    return out


def _sm_fwd(msg, dst_slot, num_segments, interpret):
    out, count = _mean_fwd(msg, dst_slot, num_segments, interpret)
    return out, (dst_slot, count)


def _sm_bwd(num_segments, interpret, res, g):
    dst_slot, count = res
    cnt = jnp.maximum(count[:, 0].astype(g.dtype), 1.0)
    grad = g[dst_slot] / cnt[dst_slot][:, None]
    return grad, None


segment_mean_pallas.defvjp(_sm_fwd, _sm_bwd)
