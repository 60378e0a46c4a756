"""Metric parity tests: closed-form JAX metrics vs numpy/sklearn-style math."""

import numpy as np
import jax.numpy as jnp

from prtp_tpu.utils.metrics import (
    r2_score,
    mape,
    judge_critical,
    confusion_counts,
    classification_metrics,
    mse_loss,
    cross_entropy_loss,
)


def test_r2_score_matches_definition():
    rng = np.random.default_rng(0)
    t = rng.normal(size=50).astype(np.float32)
    p = t + 0.1 * rng.normal(size=50).astype(np.float32)
    got = float(r2_score(jnp.asarray(p), jnp.asarray(t)))
    ss_res = np.sum((p - t) ** 2)
    ss_tot = np.sum((t - t.mean()) ** 2)
    np.testing.assert_allclose(got, 1 - ss_res / ss_tot, rtol=1e-5)


def test_r2_score_masked():
    t = jnp.array([1.0, 2.0, 3.0, 999.0])
    p = jnp.array([1.1, 1.9, 3.2, 0.0])
    m = jnp.array([1, 1, 1, 0])
    got = float(r2_score(p, t, m))
    tt, pp = np.array([1, 2, 3.0]), np.array([1.1, 1.9, 3.2])
    expect = 1 - np.sum((pp - tt) ** 2) / np.sum((tt - tt.mean()) ** 2)
    np.testing.assert_allclose(got, expect, rtol=1e-4)


def test_judge_critical_sign_convention():
    # slack = required - predicted; negative => critical (src/train.py:391-395)
    pred = jnp.array([5.0, 1.0, 3.0])
    req = jnp.array([4.0, 2.0, 3.0])
    np.testing.assert_array_equal(np.array(judge_critical(pred, req)),
                                  [1, 0, 0])


def test_confusion_and_f1():
    pred = jnp.array([1, 1, 0, 0, 1])
    lab = jnp.array([1, 0, 0, 1, 1])
    tp, fp, tn, fn = confusion_counts(pred, lab)
    assert (float(tp), float(fp), float(tn), float(fn)) == (2, 1, 1, 1)
    acc, recall, precision, f1 = classification_metrics(tp, fp, tn, fn)
    np.testing.assert_allclose(acc, 3 / 5)
    np.testing.assert_allclose(recall, 2 / 3)
    np.testing.assert_allclose(precision, 2 / 3)
    np.testing.assert_allclose(f1, 2 / 3)


def test_zero_tp_guards():
    acc, recall, precision, f1 = classification_metrics(0, 5, 5, 5)
    assert recall == 0 and precision == 0 and f1 == 0


def test_mse_and_mape_masked():
    p = jnp.array([2.0, 4.0, 100.0])
    t = jnp.array([1.0, 2.0, 1.0])
    m = jnp.array([1, 1, 0])
    np.testing.assert_allclose(float(mse_loss(p, t, m)), (1 + 4) / 2)
    np.testing.assert_allclose(float(mape(p, t, m)), (1 + 1) / 2)


def test_cross_entropy_matches_numpy():
    logits = jnp.array([[2.0, 1.0], [0.5, 1.5], [3.0, 0.0]])
    labels = jnp.array([0, 1, 1])
    got = float(cross_entropy_loss(logits, labels))
    l_np = np.asarray(logits)
    probs = np.exp(l_np) / np.exp(l_np).sum(-1, keepdims=True)
    expect = -np.log(probs[np.arange(3), np.asarray(labels)]).mean()
    np.testing.assert_allclose(got, expect, rtol=1e-5)
