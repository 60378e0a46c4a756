"""Training engine: jitted train/eval steps over packed designs.

TPU-native counterpart of the reference train loop internals
(``src/train.py:397-586``): one ``train_step`` = full-graph level scan +
CNN forward + fusion + masked loss on the endpoint batch + Adam update,
all inside a single jit (donated state). The reference instead re-runs
the level loop per batch with per-level host->device transfers; see
MODEL_NOTES.md for the equivalence argument.

Batches are fixed-size padded id vectors with a validity mask, so each
design compiles exactly one step executable.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from .graph import DesignData
from .utils import metrics as M


@struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray
    best_f1: jnp.ndarray
    best_r2: jnp.ndarray


def make_optimizer(learning_rate: float, weight_decay: float = 0.0,
                   flat: bool = False):
    """Adam with torch-style (coupled) L2 weight decay
    (reference src/train.py:430-443).

    ``flat=True`` runs the identical Adam math over one concatenated
    parameter vector — a single fused kernel instead of one per leaf
    (kernel-launch overhead is the measured cost driver on the target
    chip)."""
    if flat:
        return make_flat_adam(learning_rate, weight_decay)
    if weight_decay:
        return optax.chain(
            optax.add_decayed_weights(weight_decay),
            optax.adam(learning_rate),
        )
    return optax.adam(learning_rate)


def make_flat_adam(learning_rate: float, weight_decay: float = 0.0,
                   b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8):
    """Adam over a single flattened parameter vector (optax-compatible)."""

    def _flatten(tree):
        leaves = jax.tree_util.tree_leaves(tree)
        return jnp.concatenate([l.reshape(-1) for l in leaves])

    def _unflatten(flat, tree):
        leaves, treedef = jax.tree_util.tree_flatten(tree)
        out = []
        off = 0
        for l in leaves:
            n = l.size
            out.append(flat[off: off + n].reshape(l.shape).astype(l.dtype))
            off += n
        return jax.tree_util.tree_unflatten(treedef, out)

    def init(params):
        flat = _flatten(params)
        return {"mu": jnp.zeros_like(flat), "nu": jnp.zeros_like(flat),
                "count": jnp.zeros((), jnp.int32)}

    def update(grads, state, params=None):
        g = _flatten(grads)
        if weight_decay:
            g = g + weight_decay * _flatten(params)
        count = state["count"] + 1
        mu = b1 * state["mu"] + (1 - b1) * g
        nu = b2 * state["nu"] + (1 - b2) * (g * g)
        t = count.astype(mu.dtype)
        mu_hat = mu / (1 - b1 ** t)
        nu_hat = nu / (1 - b2 ** t)
        upd_flat = -learning_rate * mu_hat / (jnp.sqrt(nu_hat) + eps)
        updates = _unflatten(upd_flat, grads)
        return updates, {"mu": mu, "nu": nu, "count": count}

    return optax.GradientTransformation(init, update)


def init_state(model, tx, design: DesignData, rng, batch_size: int = 4):
    b = min(batch_size, design.num_paths)
    if design.cnn_input.shape[0] > 1:  # merged super-graph: grouped ids
        path_ids = jnp.zeros((design.cnn_input.shape[0], b), jnp.int32)
    else:
        path_ids = jnp.zeros((b,), jnp.int32)
    # jit the init: eager flax init dispatches one op at a time, which
    # on a remote-tunneled chip (~36 ms/op round-trip) costs minutes;
    # one compiled program runs in seconds AND lands in the persistent
    # compile cache, so bench/warm_cache re-runs skip it entirely
    variables = jax.jit(model.init)(rng, design, path_ids)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32),
        best_f1=jnp.zeros(()),
        best_r2=jnp.full((), -jnp.inf),
    )


def init_state_abstract(model, tx, design: DesignData, rng,
                        batch_size: int = 4) -> TrainState:
    """Shape-only TrainState template (no device compute) — used as the
    treedef for checkpoint restoration, skipping the init compile."""
    return jax.eval_shape(
        functools.partial(init_state, model, tx, batch_size=batch_size),
        design, rng)


def _forward(model, params, batch_stats, design, path_ids, train):
    variables = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats
    if train and batch_stats:
        out, updates = model.apply(variables, design, path_ids, train=True,
                                   mutable=["batch_stats"])
        return out, updates["batch_stats"]
    out = model.apply(variables, design, path_ids, train=False)
    return out, batch_stats


def _task_loss_and_metrics(task, preds, design, path_ids, mask):
    endpoints = design.path_endpoint[path_ids]
    labels = design.is_critical[endpoints]
    if task == "cls":
        loss = M.cross_entropy_loss(preds, labels, mask)
        pred_labels = jnp.argmax(preds, axis=-1)
        r2 = jnp.zeros(())
    else:
        arrival = design.arrival_time[endpoints]
        required = design.required_time[endpoints]
        loss = M.mse_loss(preds, arrival, mask)
        pred_labels = M.judge_critical(preds, required)
        r2 = M.r2_score(preds, arrival, mask)
    tp, fp, tn, fn = M.confusion_counts(pred_labels, labels, mask)
    return loss, {"loss": loss, "r2": r2, "tp": tp, "fp": fp,
                  "tn": tn, "fn": fn}


def make_raw_train_step(model, tx, task: str = "reg"):
    """Unjitted step(state, design, path_ids, mask) -> (state, metrics)."""

    def step_fn(state: TrainState, design: DesignData, path_ids, mask):
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
        new_state = state.replace(
            params=new_params, batch_stats=new_stats, opt_state=new_opt,
            step=state.step + 1)
        return new_state, mets

    return step_fn


def make_train_step(model, tx, task: str = "reg", donate: bool = True):
    """Returns jitted step(state, design, path_ids, mask) -> (state, metrics)."""
    step_fn = make_raw_train_step(model, tx, task)
    donate_argnums = (0,) if donate else ()
    return jax.jit(step_fn, donate_argnums=donate_argnums)


def make_multi_train_step(model, tx, n_steps: int, task: str = "reg",
                          donate: bool = True):
    """Rolls ``n_steps`` optimizer steps (same batch) into ONE device
    dispatch via ``lax.fori_loop`` — amortizes host->device dispatch
    latency; also the honest way to time the step on a remote-tunneled
    chip. Returns jitted fn(state, design, path_ids, mask) ->
    (state, last_metrics)."""
    step_fn = make_raw_train_step(model, tx, task)

    def multi(state: TrainState, design: DesignData, path_ids, mask):
        _, mets0 = jax.eval_shape(step_fn, state, design, path_ids, mask)
        zeros = jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype), mets0)

        def body(_, carry):
            st, _m = carry
            st, mets = step_fn(st, design, path_ids, mask)
            return st, mets

        state, mets = jax.lax.fori_loop(0, n_steps, body, (state, zeros))
        return state, mets

    donate_argnums = (0,) if donate else ()
    return jax.jit(multi, donate_argnums=donate_argnums)


def make_scan_train_step(model, tx, task: str = "reg", donate: bool = True):
    """One device dispatch = one optimizer step per row of *distinct*
    stacked batches (ids/mask shaped (n_steps, B)) via ``lax.scan`` — the
    reference's shuffled-batch semantics at multi-step dispatch cost.
    ``jit`` re-specializes per distinct ``n_steps`` automatically.
    Returns jitted fn(state, design, ids_2d, mask_2d) ->
    (state, stacked per-step metrics)."""
    step_fn = make_raw_train_step(model, tx, task)

    def scan_steps(state: TrainState, design: DesignData, ids_2d, mask_2d):
        def body(st, xs):
            ids, mask = xs
            st, mets = step_fn(st, design, ids, mask)
            return st, mets

        state, mets = jax.lax.scan(body, state, (ids_2d, mask_2d))
        return state, mets

    donate_argnums = (0,) if donate else ()
    return jax.jit(scan_steps, donate_argnums=donate_argnums)


def make_eval_step(model, task: str = "reg"):
    """Returns jitted eval(state, design, path_ids, mask) -> (preds, metrics)."""

    def eval_fn(state: TrainState, design: DesignData, path_ids, mask):
        preds, _ = _forward(model, state.params, state.batch_stats,
                            design, path_ids, train=False)
        _, mets = _task_loss_and_metrics(task, preds, design, path_ids, mask)
        return preds, mets

    return jax.jit(eval_fn)


def pad_batch(path_ids: np.ndarray, batch_size: int):
    """Pad a path-id batch to a fixed size; returns (ids, mask)."""
    n = len(path_ids)
    ids = np.zeros(batch_size, np.int32)
    ids[:n] = path_ids
    mask = np.zeros(batch_size, np.float32)
    mask[:n] = 1.0
    return jnp.asarray(ids), jnp.asarray(mask)


def iterate_batches(path_ids, batch_size: int, rng: np.random.Generator,
                    shuffle: bool = True, drop_last: bool = False):
    """Shuffled fixed-size padded batches over a path-id universe.

    Mirrors the reference DataLoader usage (src/train.py:469-472): when
    the universe fits in one batch, a single (padded) batch; otherwise
    shuffled batches, optionally dropping the last partial one.
    """
    ids = np.asarray(path_ids, np.int64)
    if shuffle:
        ids = ids[rng.permutation(len(ids))]
    if len(ids) <= batch_size:
        yield pad_batch(ids, batch_size)
        return
    n_full = len(ids) // batch_size
    for i in range(n_full):
        yield pad_batch(ids[i * batch_size: (i + 1) * batch_size], batch_size)
    rem = ids[n_full * batch_size:]
    if len(rem) and not drop_last:
        yield pad_batch(rem, batch_size)


def iterate_grouped_batches(per_design_ids, batch_size: int,
                            rng: np.random.Generator, shuffle: bool = True):
    """Grouped batches over a merged super-graph
    (:func:`prtp_tpu.graph.merge_parsed_designs`): yields
    ``(ids (K, B), mask (K, B))`` rounds where row k draws only from
    design k's universe. Designs with fewer batches pad out with
    zero-mask rows once exhausted."""
    streams = []
    for ids in per_design_ids:
        ids = np.asarray(ids, np.int64)
        if shuffle:
            ids = ids[rng.permutation(len(ids))]
        streams.append(ids)
    n_rounds = max(batch_count(len(s), batch_size, drop_last=False)
                   for s in streams)
    for r in range(n_rounds):
        ids2, mask2 = [], []
        for s in streams:
            i, m = pad_batch(s[r * batch_size: (r + 1) * batch_size],
                             batch_size)
            ids2.append(i)
            mask2.append(m)
        yield jnp.stack(ids2), jnp.stack(mask2)


def batch_count(num_ids: int, batch_size: int, drop_last: bool) -> int:
    if num_ids <= batch_size:
        return 1
    n_full = num_ids // batch_size
    rem = num_ids % batch_size
    return n_full + (1 if rem and not drop_last else 0)


class DesignCache:
    """Packed-design cache: loads a design npz once per process and keeps
    the device-resident DesignData (the reference re-loads the pickle from
    disk every epoch, src/train.py:461-463).

    :meth:`prefetch` loads+packs a design on ONE background worker thread
    so host-side preprocessing (npz read, level-table build, im2col
    patches, H2D puts) overlaps the device steps of the design currently
    training — the double-buffered input pipeline of SURVEY §7 phase 4.
    The worker holds the GIL only while doing numpy work; while the main
    thread waits on device dispatches the overlap is real even on one
    core. A prefetch failure is not swallowed: the exception re-raises
    at the blocking :meth:`get`."""

    def __init__(self, pack_fn):
        self._pack = pack_fn
        self._cache = {}
        self._pending = {}
        self._pool = None

    def _load_and_pack(self, loader):
        parsed = loader()
        return (self._pack(parsed), parsed)

    def get(self, key, loader):
        if key in self._cache:
            return self._cache[key]
        fut = self._pending.pop(key, None)
        if fut is not None:
            self._cache[key] = fut.result()  # re-raises worker errors
        else:
            self._cache[key] = self._load_and_pack(loader)
        return self._cache[key]

    def put(self, key, value):
        """Replace the cached entry for ``key`` (e.g. with a
        mesh-replicated copy of the pack, so later gets skip the H2D)."""
        self._cache[key] = value

    def prefetch(self, key, loader):
        """Schedule load+pack of ``key`` in the background (idempotent)."""
        if key in self._cache or key in self._pending:
            return
        if self._pool is None:
            from concurrent.futures import ThreadPoolExecutor
            self._pool = ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="prtp-prefetch")
        self._pending[key] = self._pool.submit(self._load_and_pack, loader)
