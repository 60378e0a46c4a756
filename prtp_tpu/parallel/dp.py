"""Data-parallel training over a device mesh.

Two equivalent paths, both producing replica-identical updates:

1. ``make_dp_train_step`` — the idiomatic JAX route: the single-chip
   step from :mod:`prtp_tpu.trainer` jitted with ``NamedSharding``
   annotations (batch sharded on the ``dp`` axis, state and graph
   replicated); XLA inserts the gradient ``psum`` over ICI.
2. ``make_shard_map_train_step`` — an explicit ``shard_map`` SPMD
   formulation with hand-placed ``lax.psum`` collectives (global-mean
   loss from psum'd (sum, count); psum'd grads and confusion counts).
   This is the template that later composes with graph-dimension
   sharding for 100k+-cell designs.

Both require the padded batch length to be divisible by the mesh size
(callers pad with masked entries, which is free — masked entries carry
zero loss weight).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import optax
from jax.sharding import PartitionSpec as P
from jax import shard_map

from ..trainer import TrainState, _forward
from ..utils import metrics as M
from .mesh import DP_AXIS, batch_sharding, replicated


def shard_batch(mesh, path_ids, mask, axis: str = DP_AXIS):
    """Place a padded batch with the dp sharding (pads to mesh size)."""
    n = mesh.devices.size
    b = path_ids.shape[0]
    pad = (-b) % n
    if pad:
        path_ids = jnp.concatenate(
            [path_ids, jnp.zeros((pad,), path_ids.dtype)])
        mask = jnp.concatenate([mask, jnp.zeros((pad,), mask.dtype)])
    sh = batch_sharding(mesh, axis)
    return jax.device_put(path_ids, sh), jax.device_put(mask, sh)


def make_dp_train_step(model, tx, mesh, task: str = "reg",
                       donate: bool = True):
    """jit + sharding-annotation data parallelism (XLA auto-collectives)."""
    from ..trainer import _task_loss_and_metrics

    def step_fn(state: TrainState, design, path_ids, mask):
        def loss_fn(params):
            preds, new_stats = _forward(model, params, state.batch_stats,
                                        design, path_ids, train=True)
            loss, mets = _task_loss_and_metrics(task, preds, design,
                                                path_ids, mask)
            return loss, (mets, new_stats)

        (loss, (mets, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return state.replace(params=new_params, batch_stats=new_stats,
                             opt_state=new_opt, step=state.step + 1), mets

    repl = replicated(mesh)
    bsh = batch_sharding(mesh)
    return jax.jit(
        step_fn,
        in_shardings=(repl, repl, bsh, bsh),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate else (),
    )


def make_dp_eval_step(model, mesh, task: str = "reg"):
    from ..trainer import _task_loss_and_metrics

    def eval_fn(state: TrainState, design, path_ids, mask):
        preds, _ = _forward(model, state.params, state.batch_stats,
                            design, path_ids, train=False)
        _, mets = _task_loss_and_metrics(task, preds, design, path_ids, mask)
        return preds, mets

    repl = replicated(mesh)
    bsh = batch_sharding(mesh)
    return jax.jit(eval_fn, in_shardings=(repl, repl, bsh, bsh),
                   out_shardings=(bsh, repl))


def make_shard_map_train_step(model, tx, mesh, task: str = "reg",
                              axis: str = DP_AXIS):
    """Explicit SPMD: per-shard grads of a global-mean loss, psum'd."""

    def per_shard(state: TrainState, design, path_ids, mask):
        def loss_fn(params):
            preds, new_stats = _forward(model, params, state.batch_stats,
                                        design, path_ids, train=True)
            endpoints = design.path_endpoint[path_ids]
            labels = design.is_critical[endpoints]
            if task == "cls":
                # masked per-example nll, globally averaged
                logits = preds
                logp = jax.nn.log_softmax(logits, axis=-1)
                nll = -jnp.take_along_axis(
                    logp, labels.reshape(-1, 1), axis=-1).reshape(-1)
                local_sum = (nll * mask).sum()
                pred_labels = jnp.argmax(logits, axis=-1)
                r2 = jnp.zeros(())
            else:
                arrival = design.arrival_time[endpoints]
                required = design.required_time[endpoints]
                sq = (preds - arrival) ** 2
                local_sum = (sq * mask).sum()
                pred_labels = M.judge_critical(preds, required)
                # r2 from psum'd moments
                n_g = jax.lax.psum(mask.sum(), axis)
                t_sum = jax.lax.psum((arrival * mask).sum(), axis)
                t_sq = jax.lax.psum((arrival ** 2 * mask).sum(), axis)
                ss_res = jax.lax.psum(
                    (((preds - arrival) ** 2) * mask).sum(), axis)
                mean = t_sum / jnp.maximum(n_g, 1.0)
                ss_tot = t_sq - n_g * mean ** 2
                r2 = 1.0 - ss_res / jnp.maximum(ss_tot, 1e-12)
            n_global = jax.lax.psum(mask.sum(), axis)
            loss = jax.lax.psum(local_sum, axis) / jnp.maximum(n_global, 1.0)
            tp, fp, tn, fn = M.confusion_counts(pred_labels, labels, mask)
            mets = {"loss": loss, "r2": r2,
                    "tp": jax.lax.psum(tp, axis),
                    "fp": jax.lax.psum(fp, axis),
                    "tn": jax.lax.psum(tn, axis),
                    "fn": jax.lax.psum(fn, axis)}
            return loss, (mets, new_stats)

        (loss, (mets, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        # loss is already the global mean -> per-shard grads are partial
        # contributions; sum them across the mesh.
        grads = jax.lax.psum(grads, axis)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            params=new_params, batch_stats=new_stats, opt_state=new_opt,
            step=state.step + 1)
        return new_state, mets

    smapped = shard_map(
        per_shard, mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis)),
        out_specs=(P(), P()),
    )
    return jax.jit(smapped)
