"""Frozen goldens for the VARIANT model paths on the pinned fixture.

The main reference-parity anchor (test_reference_parity.py) covers the
default mailbox-softmax/mean path only. These goldens pin the two
variant surfaces so refactors of ``_PairStep`` / ``fused_exact_gnn``
can't silently drift them:

- the attention variant (``--attn --num_heads``): the reference declares
  this surface (src/model.py:125-136, src/options.py) but its path reads
  unset ``ndata['key']`` and cannot run — ours is the documented working
  implementation of that surface, so the golden is a frozen self-anchor,
  not a reference transcription;
- the cls task head (``--task cls`` / ``nlabels=2``,
  src/train.py:515-517): 2-logit output head.

Regenerate after a DELIBERATE semantic change (the diff is the review
artifact):  python tests/test_variant_goldens.py regen
"""

import os
import sys

import numpy as np
import pytest

import test_reference_parity as trp

FIXTURES = trp.FIXTURES
MAP_SIZE = trp.MAP_SIZE

ATTN_KW = dict(trp.MODEL_KW, flag_attn=True, num_heads=2)
CLS_KW = dict(trp.MODEL_KW, nlabels=2)


def _build(parsed, **model_kw):
    import jax
    import jax.numpy as jnp
    from prtp_tpu.graph import pack_design
    from prtp_tpu.models import PathModel

    # goldens were frozen on the plain-conv path; the default im2col
    # path is covered by test_reference_parity (exact in f32 since r4)
    design = pack_design(parsed, map_size=MAP_SIZE, align=8,
                         cnn_patches=False)
    model = PathModel(**model_kw)
    pids = jnp.arange(design.num_paths, dtype=jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), design, pids)
    # jitter every leaf (same recipe as the main parity fixture) so
    # zero-bias blind spots can't hide drift
    leaves, treedef = jax.tree_util.tree_flatten(variables)
    keys = jax.random.split(jax.random.PRNGKey(7), len(leaves))
    leaves = [l + 0.05 * jax.random.normal(k, l.shape, l.dtype)
              for l, k in zip(leaves, keys)]
    variables = jax.tree_util.tree_unflatten(treedef, leaves)
    return model, variables, design, pids


@pytest.fixture(scope="module")
def parsed():
    return trp.parsed.__wrapped__()


def test_attn_outputs_match_golden(parsed):
    model, variables, design, pids = _build(parsed, **ATTN_KW)
    got = np.asarray(model.apply(variables, design, pids))
    golden = np.load(os.path.join(FIXTURES, "golden_outputs_attn.npz"))
    assert got.shape == golden["outputs"].shape
    np.testing.assert_allclose(got, golden["outputs"], rtol=2e-4,
                               atol=2e-4)


def test_cls_outputs_match_golden(parsed):
    model, variables, design, pids = _build(parsed, **CLS_KW)
    got = np.asarray(model.apply(variables, design, pids))
    golden = np.load(os.path.join(FIXTURES, "golden_outputs_cls.npz"))
    assert got.shape == golden["outputs"].shape  # (num_paths, 2) logits
    np.testing.assert_allclose(got, golden["outputs"], rtol=2e-4,
                               atol=2e-4)


if __name__ == "__main__":
    assert sys.argv[1:] == ["regen"], "usage: test_variant_goldens.py regen"
    import jax
    jax.config.update("jax_platforms", "cpu")

    p = trp.parsed.__wrapped__()
    for kw, fname in ((ATTN_KW, "golden_outputs_attn.npz"),
                      (CLS_KW, "golden_outputs_cls.npz")):
        m, v, d, ids = _build(p, **kw)
        outs = np.asarray(m.apply(v, d, ids))
        np.savez(os.path.join(FIXTURES, fname), outputs=outs)
        print(f"{fname} regenerated:", outs.reshape(-1)[:4])
