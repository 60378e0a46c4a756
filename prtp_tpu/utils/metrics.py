"""Evaluation metrics, closed-form in JAX.

Replaces ``torchmetrics.R2Score`` (reference ``src/train.py:31``) and the
manual confusion-matrix arithmetic (``src/train.py:538-549``). All
functions are jit-safe: they take an optional validity ``mask`` so padded
batch entries do not contribute, and return scalars.
"""

from __future__ import annotations

import jax.numpy as jnp


def r2_score(pred, target, mask=None):
    """Coefficient of determination, matching torchmetrics.R2Score.

    R2 = 1 - SS_res / SS_tot with SS_tot computed around the masked mean.
    """
    pred = pred.reshape(-1)
    target = target.reshape(-1)
    if mask is None:
        mask = jnp.ones_like(target, dtype=jnp.float32)
    else:
        mask = mask.reshape(-1).astype(jnp.float32)
    n = jnp.maximum(mask.sum(), 1.0)
    mean = (target * mask).sum() / n
    ss_res = (((pred - target) ** 2) * mask).sum()
    ss_tot = (((target - mean) ** 2) * mask).sum()
    return 1.0 - ss_res / jnp.maximum(ss_tot, 1e-12)


def mape(pred, target, mask=None):
    """Mean absolute percentage error (reference src/test.py:214)."""
    pred = pred.reshape(-1)
    target = target.reshape(-1)
    if mask is None:
        mask = jnp.ones_like(target, dtype=jnp.float32)
    else:
        mask = mask.reshape(-1).astype(jnp.float32)
    n = jnp.maximum(mask.sum(), 1.0)
    rel = jnp.abs((pred - target) / jnp.where(target == 0, 1.0, target))
    return (rel * mask).sum() / n


def judge_critical(pred_arrival, required):
    """Predicted criticality from predicted slack sign.

    slack = required - predicted arrival; negative => critical (label 1).
    Parity with reference ``src/train.py:391-395``.
    """
    pred_slack = required - pred_arrival
    return (pred_slack < 0).astype(jnp.int32)


def confusion_counts(pred_labels, labels, mask=None):
    """(tp, fp, tn, fn) counts treating nonzero labels as positive.

    Parity with reference src/train.py:538-541.
    """
    pred_pos = pred_labels != 0
    pos = labels != 0
    if mask is None:
        m = jnp.ones_like(labels, dtype=jnp.float32)
    else:
        m = mask.astype(jnp.float32)
    tp = (pred_pos & pos).astype(jnp.float32) * m
    fp = (pred_pos & ~pos).astype(jnp.float32) * m
    tn = (~pred_pos & ~pos).astype(jnp.float32) * m
    fn = (~pred_pos & pos).astype(jnp.float32) * m
    return tp.sum(), fp.sum(), tn.sum(), fn.sum()


def classification_metrics(tp, fp, tn, fn):
    """acc/recall/precision/F1 with the reference's zero-guard semantics.

    Reference sets recall=precision=0 when tp==0 and F1=0 when both are 0
    (src/train.py:542-549). Computed host-side on scalars.
    """
    tp, fp, tn, fn = float(tp), float(fp), float(tn), float(fn)
    total = tp + fp + tn + fn
    acc = (tp + tn) / total if total > 0 else 0.0
    recall = tp / (tp + fn) if tp != 0 else 0.0
    precision = tp / (tp + fp) if tp != 0 else 0.0
    f1 = (2 * recall * precision / (recall + precision)
          if (precision != 0 or recall != 0) else 0.0)
    return acc, recall, precision, f1


def mse_loss(pred, target, mask=None):
    """Masked mean-squared error (reference loss, src/train.py:32)."""
    pred = pred.reshape(-1)
    target = target.reshape(-1)
    if mask is None:
        mask = jnp.ones_like(target, dtype=jnp.float32)
    else:
        mask = mask.reshape(-1).astype(jnp.float32)
    n = jnp.maximum(mask.sum(), 1.0)
    return (((pred - target) ** 2) * mask).sum() / n


def cross_entropy_loss(logits, labels, mask=None):
    """Masked softmax cross-entropy (reference cls task loss)."""
    logits = logits.reshape(-1, logits.shape[-1])
    logp = logits - jnp.log(jnp.sum(jnp.exp(
        logits - logits.max(axis=-1, keepdims=True)),
        axis=-1, keepdims=True)) - logits.max(axis=-1, keepdims=True)
    nll = -jnp.take_along_axis(logp, labels.reshape(-1, 1), axis=-1).reshape(-1)
    if mask is None:
        mask = jnp.ones_like(nll, dtype=jnp.float32)
    else:
        mask = mask.reshape(-1).astype(jnp.float32)
    n = jnp.maximum(mask.sum(), 1.0)
    return (nll * mask).sum() / n
