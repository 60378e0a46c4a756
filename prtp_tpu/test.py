"""Evaluation driver.

CLI parity with the reference ``python test.py`` (``src/test.py``):
loads the trained checkpoint, evaluates every design in the test list
over all of its paths, prints per-level R²/MAPE diagnostics
(``src/test.py:211-216``), saves a relative-error-vs-level scatter plot
per design to ``visual/{case}.png`` (``:244-249``), and appends the
overall metric row to ``predict.txt`` (``:315-317``).

Usage:
    python -m prtp_tpu.test --data_save_path ... --model_saving_dir ...
"""

from __future__ import annotations

import json
import os
import sys
from time import time

import numpy as np
import jax

from .data.dataset import get_design_list, load_design_npz
from .graph import bucket_shape, pack_design
from .models.fusion import model_from_options
from .options import get_options
from .trainer import (init_state_abstract, make_eval_step, make_optimizer,
                      pad_batch)
from .utils import checkpoint as ckpt
from .utils import metrics as M


def load_model_state(options, sample_pack):
    """Restore the checkpoint (must exist — reference src/test.py:37)."""
    assert ckpt.checkpoint_exists(options.model_saving_dir), \
        f"no checkpoint in {options.model_saving_dir}"
    model = model_from_options(options)
    # the saved run's --flat_adam decides the opt-state structure the
    # template must match (the eval never steps the optimizer, but
    # from_bytes restores the whole state tree); a config predating
    # the flag was per-leaf Adam by construction -> missing = False
    flat = bool(ckpt.load_config(options.model_saving_dir).get(
        "flat_adam", False))
    tx = make_optimizer(options.learning_rate, options.weight_decay,
                        flat=flat)
    template = init_state_abstract(model, tx, sample_pack,
                                   jax.random.PRNGKey(0))
    state, config = ckpt.load_checkpoint(options.model_saving_dir, template)
    return model, state, config


def _feat_adjusted(parsed, options):
    if options.feat_reduce is not None:
        if options.feat_reduce[1] != 0:
            parsed["net_feat"] = parsed["net_feat"][:, :-options.feat_reduce[1]]
        if options.feat_reduce[0] != 0:
            parsed["cell_feat"] = parsed["cell_feat"][:, :-options.feat_reduce[0]]
    if options.norm:
        from .data.dataset import min_max_norm
        parsed["cell_feat"] = min_max_norm(parsed["cell_feat"],
                                           parsed["num_ctypes"])
    return parsed


def test(options, designs, mesh=None):
    """Evaluate all paths of each design (reference test(), :124-318)."""
    from .parallel.mesh import batch_sharding, replicated
    res_save_path = os.path.join(options.model_saving_dir, "predict.txt")
    overall = dict(loss=0.0, r2=0.0, acc=0.0, recall=0.0, precision=0.0,
                   f1=0.0)
    res = []

    parsed_all = [_feat_adjusted(load_design_npz(
        os.path.join(options.data_save_path, f"{d}.npz")), options)
        for d in designs]
    # Eval ALWAYS uses one padded bucket across designs => a single
    # eval-step compile for the whole corpus. --exact_levels /
    # --scan_groups are TRAIN-step packings (the level walk runs
    # thousands of times there); eval runs each design once, where a
    # per-design-shape packing would pay one multi-minute XLA compile
    # per design for compute that the padded scan finishes in
    # milliseconds. Numerically identical (packing equivalence pinned
    # by test_models / variant goldens).
    bucket = bucket_shape(parsed_all, map_size=options.map_size)
    want_patches = not options.no_cnn and not options.unet
    first_pack = pack_design(parsed_all[0], map_size=options.map_size,
                             pad_to=bucket, cnn_patches=want_patches)
    model, state, _config = load_model_state(options, first_pack)
    eval_step = make_eval_step(model, options.task)
    if mesh is not None:
        state = jax.device_put(state, replicated(mesh))

    for case_idx, (design, parsed) in enumerate(zip(designs, parsed_all)):
        pack = pack_design(parsed, map_size=options.map_size, pad_to=bucket,
                           cnn_patches=want_patches)
        start_time = time()
        all_ids = np.arange(parsed["num_paths"], dtype=np.int64)
        cap = pack.num_paths
        if mesh is not None:
            n_dev = mesh.devices.size
            cap = -(-cap // n_dev) * n_dev
        pids, mask = pad_batch(all_ids, cap)
        if mesh is not None:
            pack = jax.device_put(pack, replicated(mesh))
            bsh = batch_sharding(mesh)
            pids = jax.device_put(pids, bsh)
            mask = jax.device_put(mask, bsh)
        preds, mets = eval_step(state, pack, pids, mask)
        preds = np.asarray(preds)[: parsed["num_paths"]]
        runtime = time() - start_time

        levels = parsed["path2level"]
        arrival = parsed["arrival_time"][parsed["path_endpoint"]]
        if options.task == "reg":
            # per-level diagnostics (reference src/test.py:211-216)
            for lvl in np.unique(levels):
                sel = levels == lvl
                if sel.sum() >= 2:
                    r2_l = float(M.r2_score(preds[sel], arrival[sel]))
                    mape_l = float(M.mape(preds[sel], arrival[sel]))
                    print(f"level {lvl}: #={int(sel.sum())}, r2={r2_l}, "
                          f"mape={mape_l}")
            _plot_relative_error(options, case_idx, levels, preds, arrival)
            # predicted-critical path ids (capability of the reference's
            # predict_critical dumps, src/test.py:408-411, JSON not pickle)
            required = parsed["required_time"][parsed["path_endpoint"]]
            pred_crit = np.nonzero(required - preds < 0)[0].tolist()
            crit_dir = os.path.join(options.model_saving_dir,
                                    "predict_critical")
            os.makedirs(crit_dir, exist_ok=True)
            with open(os.path.join(crit_dir, f"{design}.json"), "w") as f:
                json.dump(pred_crit, f)

        loss = float(mets["loss"])
        r2 = float(mets["r2"])
        acc, recall, precision, f1 = M.classification_metrics(
            mets["tp"], mets["fp"], mets["tn"], mets["fn"])
        for k, v in zip(("loss", "r2", "acc", "recall", "precision", "f1"),
                        (loss, r2, acc, recall, precision, f1)):
            overall[k] += v
        print(f"case {case_idx}, runtime: {runtime}")
        print(f"\ttp: {int(mets['tp'])}  fp: {int(mets['fp'])} "
              f" fn: {int(mets['fn'])}  tn: {int(mets['tn'])} "
              f" precision: {round(precision, 3)}")
        print(f"\tloss:{loss:.3f}, r2:{r2:.3f}, acc:{acc:.3f}, "
              f"recall:{recall:.3f}, F1 score:{f1:.3f}")
        res.append([loss, r2, acc, recall, precision, f1])

    n = max(len(designs), 1)
    for k in overall:
        overall[k] /= n
    print("overall val")
    print(f"\tloss:{overall['loss']:.3f}, r2:{overall['r2']:.3f}, "
          f"acc:{overall['acc']:.3f}, recall:{overall['recall']:.3f}, "
          f"F1 score:{overall['f1']:.3f}")
    with open(res_save_path, "a") as f:
        f.write("{:.3f} {:.3f} {:.3f} {:.3f} {:.3f} {:.3f}\n".format(
            overall["loss"], overall["r2"], overall["acc"],
            overall["recall"], overall["precision"], overall["f1"]))
    return res, overall["f1"], overall["r2"]


def _plot_relative_error(options, case_idx, levels, preds, arrival):
    """Scatter of relative error vs topo level -> visual/{case}.png
    (reference src/test.py:244-249). Soft dependency on matplotlib."""
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return
    rel = (preds - arrival) / np.where(arrival == 0, 1.0, arrival)
    plt.scatter(levels, rel)
    out_dir = os.path.join(options.model_saving_dir, "visual")
    os.makedirs(out_dir, exist_ok=True)
    plt.savefig(os.path.join(out_dir, f"{case_idx}.png"))
    plt.close()


def main(argv=None):
    options = get_options(argv)
    from .parallel.distributed import maybe_initialize
    from .parallel.mesh import mesh_from_options
    maybe_initialize()  # multi-host slices; env-gated no-op otherwise
    from .train import select_device
    select_device(options)
    if options.compile_cache_dir:
        from .utils.cache import enable_compile_cache
        enable_compile_cache(options.compile_cache_dir)  # TPU-only
    options.cell_feat_dim -= options.feat_reduce[0]
    options.net_feat_dim -= options.feat_reduce[1]
    designs = get_design_list(options.data_save_path, "test")
    test(options, designs, mesh=mesh_from_options(options))


if __name__ == "__main__":
    main(sys.argv[1:])
