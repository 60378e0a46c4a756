"""Training driver.

CLI parity with the reference ``python train.py`` (``src/train.py``):
same flags (options.py), same loop structure (epochs over designs over
shuffled path batches, validate every ``--val_interval`` batches and at
design end, save-on-best-validation checkpoint), same printed metric
lines — re-engineered on the jitted full-graph step of
:mod:`prtp_tpu.trainer`.

Usage:
    python -m prtp_tpu.train --data_save_path ... --model_saving_dir ...
"""

from __future__ import annotations

import os
import random
import sys

import numpy as np
import jax
import jax.numpy as jnp

from .data.dataset import (get_design_list, load_design_shapes,
                           load_single_design)
from .graph import bucket_shape
from .graph import pack_design
from .models.fusion import model_from_options
from .options import get_options
from .trainer import (
    DesignCache,
    batch_count,
    init_state,
    init_state_abstract,
    iterate_batches,
    iterate_grouped_batches,
    make_eval_step,
    make_optimizer,
    make_scan_train_step,
    pad_batch,
)
from .utils import checkpoint as ckpt
from .utils import metrics as M
from .utils.tee import StderrTee, StdoutTee


def next_val_trigger(bidx: int, num_batch: int, val_interval: int) -> int:
    """Smallest batch index >= bidx at which the reference validates:
    ``b % val_interval == 0 or b == num_batch - 1``
    (src/train.py:566-568)."""
    vi = max(int(val_interval), 1)
    next_multiple = ((bidx + vi - 1) // vi) * vi
    return min(next_multiple, num_batch - 1)


def _load(usage, options, design):
    return load_single_design(
        usage, options.data_save_path, design,
        os_rate=options.os_rate, feat_reduce=options.feat_reduce,
        if_norm=options.norm)


def validate(options, val_designs, cache_val, eval_step, state, mesh=None):
    """Per-design validation on the persisted val split; one padded batch
    per design (reference validate(), src/train.py:137-291)."""
    from .parallel.mesh import batch_sharding, replicated
    overall = dict(loss=0.0, r2=0.0, acc=0.0, recall=0.0, precision=0.0,
                   f1=0.0)
    res = []
    n_cases = 0
    print("validate:")
    for case_idx, design in enumerate(val_designs):
        if case_idx + 1 < len(val_designs):
            # one-ahead pipeline: pack the next design while the device
            # evaluates this one
            nxt = val_designs[case_idx + 1]
            cache_val.prefetch(nxt, lambda d=nxt: _load("test", options, d))
        pack, parsed = cache_val.get(
            design, lambda d=design: _load("test", options, d))
        ids = np.asarray(parsed["path_ids"], np.int64)
        if len(ids) == 0:
            # tiny designs can yield an empty val split (1/5 of <5 paths);
            # the reference would crash on an empty DataLoader here
            print(f"\tcase {case_idx} \t(empty val split, skipped)")
            continue
        n_cases += 1
        # pad to the bucketed path capacity => one eval compile for all
        # designs
        cap = max(pack.num_paths, len(ids), 1)
        if mesh is not None:
            n_dev = mesh.devices.size
            cap = -(-cap // n_dev) * n_dev  # divisible by the mesh
        pids, mask = pad_batch(ids, cap)
        if mesh is not None:
            pack = jax.device_put(pack, replicated(mesh))
            # keep the replicated copy so later validations skip the H2D
            cache_val.put(design, (pack, parsed))
            bsh = batch_sharding(mesh)
            pids = jax.device_put(pids, bsh)
            mask = jax.device_put(mask, bsh)
        _preds, mets = eval_step(state, pack, pids, mask)
        loss = float(mets["loss"])
        r2 = float(mets["r2"])
        acc, recall, precision, f1 = M.classification_metrics(
            mets["tp"], mets["fp"], mets["tn"], mets["fn"])
        for k, v in zip(("loss", "r2", "acc", "recall", "precision", "f1"),
                        (loss, r2, acc, recall, precision, f1)):
            overall[k] += v
        print(f"\tcase {case_idx} \tl:{loss:.3f}, r2:{r2:.3f}, "
              f"rc:{recall:.3f}, F1:{f1:.3f}")
        res.append([loss, r2, acc, recall, precision, f1])
    n = max(n_cases, 1)
    for k in overall:
        overall[k] /= n
    print(f"\toverall r2:{overall['r2']:.3f}, rc:{overall['recall']:.3f}, "
          f"F1:{overall['f1']:.3f}")
    return res, overall["f1"], overall["r2"]


def train(options, seed):
    rng = np.random.default_rng(seed)
    print(options.data_save_path)

    # feat_reduce shrinks the declared dims (reference src/train.py:407-408)
    options.cell_feat_dim -= options.feat_reduce[0]
    options.net_feat_dim -= options.feat_reduce[1]

    # --dp / --mesh_shape: 1-D data-parallel mesh over the path batch
    # (the batch axis shards across ICI; XLA inserts the gradient psum
    # — parallel/dp.py's jit-sharding route, wired into the CLI)
    from .parallel.mesh import (batch_sharding, mesh_from_options,
                                replicated, stacked_batch_sharding)
    mesh = mesh_from_options(options)
    if mesh is not None:
        n_dev = mesh.devices.size
        # every padded batch is exactly --batch_size long; round it up
        # to a mesh multiple (pad rows carry zero loss weight => free)
        options.batch_size = -(-options.batch_size // n_dev) * n_dev
        print(f"--- data-parallel mesh: {n_dev} x {mesh.devices[0].platform}"
              f" devices, batch_size {options.batch_size}")

    model = model_from_options(options)
    tx = make_optimizer(options.learning_rate, options.weight_decay,
                        flat=options.flat_adam)

    train_designs = get_design_list(options.data_save_path, "train")
    val_designs = get_design_list(options.data_save_path, "test")
    print("--- train designs: ", train_designs)
    print("--- test designs: ", val_designs)

    compute_dtype = (jnp.bfloat16 if options.compute_dtype == "bfloat16"
                     else jnp.float32)

    # 0 = auto (pack_design resolves the group count per design)
    scan_groups = (1 if options.exact_levels
                   else max(0, getattr(options, "scan_groups", 1)))
    if options.exact_levels or scan_groups != 1:
        # per-design shapes (true per-level under --exact_levels,
        # per-group maxima under --scan_groups): fastest per design,
        # one compile per design shape
        bucket = None
    else:
        # Bucket all designs to one padded shape so the train and eval
        # steps compile exactly once (per-design shapes would mean one
        # XLA compile each).
        all_designs = sorted(set(train_designs) | set(val_designs))
        # shapes-only loads: the full arrays are read once, later, by
        # the DesignCache loaders — not twice per design at startup
        bucket = bucket_shape(
            [load_design_shapes(os.path.join(options.data_save_path,
                                             f"{d}.npz"))
             for d in all_designs], map_size=options.map_size)

    # the im2col patch table only serves the LayoutNet fast path
    want_patches = not options.no_cnn and not options.unet

    def packer(parsed):
        return pack_design(parsed, map_size=options.map_size,
                           compute_dtype=compute_dtype, pad_to=bucket,
                           exact_levels=options.exact_levels,
                           scan_groups=scan_groups,
                           cnn_patches=want_patches)

    cache_tr = DesignCache(packer)
    if bucket is None and len(val_designs) > 1:
        # Validation always packs to ONE bucketed padded-scan shape even
        # when training uses --exact_levels / --scan_groups: exact and
        # grouped packings have per-design shapes, so a many-design
        # corpus would pay one XLA eval compile per design; the padded
        # scan's extra compute runs once per design per validation while
        # the saved compiles are minutes each. Numerically identical
        # (packing-equivalence pinned by test_models / goldens).
        val_bucket = bucket_shape(
            [load_design_shapes(os.path.join(options.data_save_path,
                                             f"{d}.npz"))
             for d in val_designs], map_size=options.map_size)

        def val_packer(parsed):
            return pack_design(parsed, map_size=options.map_size,
                               compute_dtype=compute_dtype,
                               pad_to=val_bucket,
                               cnn_patches=want_patches)

        cache_val = DesignCache(val_packer)
    else:
        cache_val = DesignCache(packer)

    merged_pack = merged_universes = None
    if options.merge_designs:
        # ONE super-graph over all train designs (disjoint union per
        # level, grouped path batches); validation stays per-design —
        # params are design-independent (graph.merge_parsed_designs)
        from .graph import merge_parsed_designs
        merged_parsed = merge_parsed_designs(
            [_load("train", options, d) for d in train_designs])
        merged_pack = pack_design(
            merged_parsed, map_size=options.map_size,
            compute_dtype=compute_dtype,
            exact_levels=options.exact_levels,
            scan_groups=scan_groups,
            cnn_patches=want_patches)
        merged_universes = merged_parsed["path_ids_per_design"]
        first_pack = merged_pack
    else:
        first_pack, _ = cache_tr.get(
            train_designs[0],
            lambda: _load("train", options, train_designs[0]))

    config = {k: v for k, v in vars(options).items()}
    if ckpt.checkpoint_exists(options.model_saving_dir):
        # the opt-state STRUCTURE must match the checkpoint before
        # load_checkpoint can restore into the template: honor the
        # saved --flat_adam over the CLI's (a config predating the
        # flag was per-leaf Adam by construction -> missing = False)
        pre_cfg = ckpt.load_config(options.model_saving_dir)
        if bool(pre_cfg.get("flat_adam", False)) != options.flat_adam:
            options.flat_adam = bool(pre_cfg.get("flat_adam", False))
            config["flat_adam"] = options.flat_adam  # keep the re-saved
            # config truthful — it must record the opt-state layout
            tx = make_optimizer(options.learning_rate,
                                options.weight_decay,
                                flat=options.flat_adam)
        template = init_state_abstract(model, tx, first_pack,
                                       jax.random.PRNGKey(seed))
        state, saved_cfg = ckpt.load_checkpoint(options.model_saving_dir,
                                                template)
        # resume-with-overrides (reference src/train.py:123-126)
        if saved_cfg:
            if not options.change_lr and "learning_rate" in saved_cfg:
                lr = float(saved_cfg["learning_rate"])
                options.learning_rate = lr
            if not options.change_alpha and "alpha" in saved_cfg:
                options.alpha = float(saved_cfg["alpha"])
        tx = make_optimizer(options.learning_rate, options.weight_decay,
                            flat=options.flat_adam)
        print("----------------Loading the model and hyper-parameters"
              "----------------")
    else:
        state = init_state(model, tx, first_pack, jax.random.PRNGKey(seed))
        os.makedirs(options.model_saving_dir, exist_ok=True)
        ckpt.save_checkpoint(options.model_saving_dir, state, config)
        print("creating model in:", options.model_saving_dir)

    if mesh is not None:
        # replicate params/opt state over the mesh; the merged pack too
        state = jax.device_put(state, replicated(mesh))
        if merged_pack is not None:
            merged_pack = jax.device_put(merged_pack, replicated(mesh))

    with open(os.path.join(options.model_saving_dir, "seed.txt"), "a") as f:
        f.write(str(seed))

    print("Hyperparameters are listed as follows:")
    print(options)
    print("seed:", seed)

    eval_step = make_eval_step(model, options.task)
    # scanned multi-batch dispatch: one device call per
    # --steps_per_dispatch distinct shuffled batches; jit re-specializes
    # per chunk length (full chunks + one remainder length at most)
    scan_step = make_scan_train_step(model, tx, options.task)

    def run_chunk(state, pack, chunk):
        ids2d = jnp.stack([c[0] for c in chunk])
        mask2d = jnp.stack([c[1] for c in chunk])
        if mesh is not None:
            # shard the batch axis over dp; jit compiles the SPMD step
            # from the input shardings (grads psum over ICI)
            sh = stacked_batch_sharding(mesh, ids2d.ndim)
            ids2d = jax.device_put(ids2d, sh)
            mask2d = jax.device_put(mask2d, sh)
        return scan_step(state, pack, ids2d, mask2d)

    max_f1 = float(state.best_f1)
    max_r2 = float(state.best_r2)
    total_steps = 0
    spd = max(options.steps_per_dispatch, 1)
    print("----------------Start training---------------")
    if options.merge_designs:
        design_units = [("+".join(train_designs), True)]
    else:
        design_units = [(d, False) for d in train_designs]
    # double-buffered input pipeline: the FIRST validation design packs
    # in the background (the reference validates at batch 0,
    # src/train.py:566) and validate() pipelines the rest one-ahead —
    # prefetching every val design here would move the whole corpus's
    # HBM residency to step 0 (r3 advisor finding); one-ahead keeps the
    # host/device overlap while residency grows only as validation
    # actually reaches each design
    if val_designs:
        cache_val.prefetch(
            val_designs[0],
            lambda d=val_designs[0]: _load("test", options, d))
    for epoch in range(options.num_epoch):
        for unit_idx, (design, is_merged) in enumerate(design_units):
            if is_merged:
                pack = merged_pack
                num_batch = max(
                    batch_count(len(u), options.batch_size, False)
                    for u in merged_universes)
                batches = list(iterate_grouped_batches(
                    merged_universes, options.batch_size, rng))
            else:
                pack, parsed = cache_tr.get(
                    design, lambda d=design: _load("train", options, d))
                if mesh is not None:
                    pack = jax.device_put(pack, replicated(mesh))
                    cache_tr.put(design, (pack, parsed))
                if len(design_units) > 1:
                    # pack the next design while this one trains
                    nxt = design_units[(unit_idx + 1) % len(design_units)][0]
                    cache_tr.prefetch(
                        nxt, lambda d=nxt: _load("train", options, d))
                ids = parsed["path_ids"]
                num_batch = batch_count(len(ids), options.batch_size,
                                        options.droplast)
                batches = list(iterate_batches(ids, options.batch_size, rng,
                                               drop_last=options.droplast))
            bidx = 0
            while bidx < len(batches):
                take = spd
                # strict validation cadence: a dispatch chunk never runs
                # past a validation trigger — it ends exactly ON the
                # triggering batch, so validation (and best-checkpoint
                # gating) happens after batch b precisely as the
                # reference's every-val_interval policy does
                # (src/train.py:566-568), while --steps_per_dispatch
                # still amortizes dispatch latency between triggers.
                take = min(take, next_val_trigger(
                    bidx, num_batch, options.val_interval) - bidx + 1)
                if options.max_steps:
                    # keep --max_steps a hard cap: never dispatch more
                    # steps than remain under it
                    take = min(take, max(options.max_steps - total_steps, 1))
                chunk = batches[bidx: bidx + take]
                state, mets = run_chunk(state, pack, chunk)
                mets = jax.device_get(mets)
                for j in range(len(chunk)):
                    loss = float(mets["loss"][j])
                    r2 = float(mets["r2"][j])
                    _acc, recall, _prec, f1 = M.classification_metrics(
                        mets["tp"][j], mets["fp"][j],
                        mets["tn"][j], mets["fn"][j])
                    print(f"e{epoch},{design},b{bidx + j}/{num_batch}, "
                          f"l:{loss:.3f}, r2:{r2:.3f}, r:{recall:.3f}, "
                          f"F1:{f1:.3f}")
                total_steps += len(chunk)
                end_idx = bidx + len(chunk) - 1
                should_validate = (
                    end_idx % options.val_interval == 0
                    or end_idx == num_batch - 1)
                bidx = end_idx + 1
                if should_validate:
                    _res, val_f1, val_r2 = validate(
                        options, val_designs, cache_val, eval_step, state,
                        mesh=mesh)
                    if options.task == "cls":
                        improved = val_f1 > max_f1
                    elif options.task == "reg":
                        improved = val_r2 > max_r2
                    else:
                        raise AssertionError(f"bad task {options.task}")
                    if improved:
                        max_f1, max_r2 = val_f1, val_r2
                        state = state.replace(
                            best_f1=jnp.asarray(max_f1),
                            best_r2=jnp.asarray(max_r2))
                        print("Saving model.... ",
                              options.model_saving_dir)
                        ckpt.save_checkpoint(options.model_saving_dir,
                                             state, config)
                        print("Model successfully saved")
                if options.max_steps and total_steps >= options.max_steps:
                    print(f"max_steps {options.max_steps} reached")
                    return state
    return state


def select_device(options):
    """Honor the reference's ``--gpu`` device index (src/options.py:
    the device selector) as "which accelerator chip": validates the
    index loudly instead of silently ignoring it."""
    if not getattr(options, "gpu", 0):
        return
    devs = jax.devices()
    if options.gpu < 0 or options.gpu >= len(devs):
        raise SystemExit(
            f"--gpu {options.gpu}: only {len(devs)} visible device(s) on "
            f"backend {jax.default_backend()} (indices 0"
            f"..{len(devs) - 1})")
    jax.config.update("jax_default_device", devs[options.gpu])


def main(argv=None):
    options = get_options(argv)
    from .parallel.distributed import maybe_initialize
    maybe_initialize()  # multi-host slices; env-gated no-op otherwise
    select_device(options)
    seed = options.seed
    random.seed(seed)
    np.random.seed(seed)
    os.makedirs(options.model_saving_dir, exist_ok=True)
    if options.debug_nans:
        # analogue of th.autograd.set_detect_anomaly(True) (src/train.py:452)
        jax.config.update("jax_debug_nans", True)
    if options.compile_cache_dir:
        from .utils.cache import enable_compile_cache
        enable_compile_cache(options.compile_cache_dir)  # TPU-only
    if options.preprocess:
        from .data import generate
        generate.main(argv)
    stdout_f = os.path.join(options.model_saving_dir, "stdout.log")
    stderr_f = os.path.join(options.model_saving_dir, "stderr.log")
    with StdoutTee(stdout_f), StderrTee(stderr_f):
        if options.profile_dir:
            with jax.profiler.trace(options.profile_dir):
                train(options, seed)
        else:
            train(options, seed)


if __name__ == "__main__":
    main(sys.argv[1:])
