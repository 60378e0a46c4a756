"""Multi-design batched training with design-axis data parallelism.

The reference trains one design at a time (``src/train.py:461``). On
TPU, designs padded to a common bucket (``prtp_tpu.graph.bucket_shape``)
are stacked along a leading axis and the whole forward is ``vmap``-ed;
sharding that axis over the mesh gives embarrassingly-parallel scaling
(each chip owns whole designs, gradients ``psum`` over ICI) — BASELINE
configs 4-5.

Note: the U-Net branch's BatchNorm running stats are not defined under
a vmapped multi-design step (rejected with NotImplementedError); use
LayoutNet here, or the merged super-graph path
(:func:`prtp_tpu.graph.merge_parsed_designs` + grouped ``path_ids``),
which batches the K rasters through one BatchNorm like any image batch
— and is also the faster single-chip multi-design layout (vmap lowers
the per-level contiguous writes to scatters).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from ..trainer import TrainState
from ..utils import metrics as M
from .mesh import batch_sharding, replicated


def _reject_unet(model):
    if getattr(model, "unet", False) and getattr(model, "use_cnn", True):
        raise NotImplementedError(
            "--unet under the vmapped multi-design step is unsupported: "
            "BatchNorm running stats are undefined per vmapped design. "
            "Use LayoutNet here, or merge the designs into one "
            "super-graph (prtp_tpu.graph.merge_parsed_designs + grouped "
            "path_ids), where BN sees the K rasters as a normal batch.")


def _batched_forward(model, params, designs, path_ids, train=False):
    def fwd_one(design, ids):
        return model.apply({"params": params}, design, ids, train=train)

    return jax.vmap(fwd_one)(designs, path_ids)  # (K, B[, nlabels])


def _batched_loss_and_metrics(model, task, params, designs, path_ids, mask):
    preds = _batched_forward(model, params, designs, path_ids)
    endpoints = jax.vmap(lambda d, i: d.path_endpoint[i])(designs, path_ids)
    labels = jax.vmap(lambda d, e: d.is_critical[e])(designs, endpoints)
    flat_mask = mask.reshape(-1)
    if task == "cls":
        loss = M.cross_entropy_loss(preds.reshape(-1, preds.shape[-1]),
                                    labels.reshape(-1), flat_mask)
        pred_labels = jnp.argmax(preds, axis=-1)
        r2 = jnp.zeros(())
    else:
        arrival = jax.vmap(lambda d, e: d.arrival_time[e])(designs, endpoints)
        required = jax.vmap(lambda d, e: d.required_time[e])(designs,
                                                             endpoints)
        loss = M.mse_loss(preds.reshape(-1), arrival.reshape(-1), flat_mask)
        pred_labels = M.judge_critical(preds, required)
        r2 = M.r2_score(preds.reshape(-1), arrival.reshape(-1), flat_mask)
    tp, fp, tn, fn = M.confusion_counts(
        pred_labels.reshape(-1), labels.reshape(-1), flat_mask)
    return loss, {"loss": loss, "r2": r2, "tp": tp, "fp": fp,
                  "tn": tn, "fn": fn}


def make_multidesign_train_step(model, tx, task: str = "reg", mesh=None,
                                donate: bool = True):
    """jitted step(state, stacked_designs, path_ids(K,B), mask(K,B)).

    With ``mesh``, the design axis is sharded over 'dp' (designs, ids
    and mask must have K divisible by the mesh size); without, it runs
    single-chip vmapped.
    """
    _reject_unet(model)

    def step_fn(state: TrainState, designs, path_ids, mask):
        def loss_fn(params):
            return _batched_loss_and_metrics(model, task, params, designs,
                                             path_ids, mask)

        (loss, mets), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(params=new_params, opt_state=new_opt,
                                  step=state.step + 1)
        return new_state, mets

    donate_argnums = (0,) if donate else ()
    if mesh is None:
        return jax.jit(step_fn, donate_argnums=donate_argnums)
    repl = replicated(mesh)
    dsh = batch_sharding(mesh)  # leading (design) axis sharded
    return jax.jit(
        step_fn,
        in_shardings=(repl, dsh, dsh, dsh),
        out_shardings=(repl, repl),
        donate_argnums=donate_argnums,
    )


def make_multidesign_eval_step(model, task: str = "reg", mesh=None):
    _reject_unet(model)

    def eval_fn(state: TrainState, designs, path_ids, mask):
        _, mets = _batched_loss_and_metrics(model, task, state.params,
                                            designs, path_ids, mask)
        preds = _batched_forward(model, state.params, designs, path_ids)
        return preds, mets

    if mesh is None:
        return jax.jit(eval_fn)
    repl = replicated(mesh)
    dsh = batch_sharding(mesh)
    return jax.jit(eval_fn, in_shardings=(repl, dsh, dsh, dsh),
                   out_shardings=(dsh, repl))
