"""CLI flag surface.

Preserves the reference's public CLI contract — flag names, types, and
defaults of ``src/options.py:4-56`` — so existing ASAP7 experiment
scripts run unchanged against the TPU framework.

TPU-native additions are kept in a clearly separated group (mesh /
sharding / precision flags); everything else is parity.
"""

import argparse

from .utils.cache import compile_cache_dir


def get_options(args=None):
    parser = argparse.ArgumentParser(
        description="TPU-native pre-routing timing prediction"
    )
    # --- parity flags (reference src/options.py:6-51) ---
    parser.add_argument("--learning_rate", type=float, default=1e-3,
                        help="the learning rate for training. Type: float.")
    parser.add_argument("--batch_size", type=int, default=1350,
                        help="the number of samples in each training batch. Type: int")
    parser.add_argument("--num_epoch", type=int, default=1000,
                        help="number of epoches that the training procedure runs. Type: int")
    parser.add_argument("--in_dim", type=int, default=512,
                        help="the dimension of the input feature. Type: int")
    parser.add_argument("--out_dim", type=int, default=128,
                        help="the dimension of the output embedding. Type: int")
    parser.add_argument("--cell_feat_dim", type=int, default=42,
                        help="the dimension of the cell feature. Type: int")
    parser.add_argument("--net_feat_dim", type=int, default=3,
                        help="the dimension of the net feature. Type: int")
    parser.add_argument("--hidden_dim", type=int, default=256,
                        help="the dimension of the intermediate GNN layers. Type: int")
    parser.add_argument("--cnn_input_dim", type=int, default=512)
    parser.add_argument("--cnn_outdim", type=int, default=128)
    parser.add_argument("--map_size", type=int, default=128)
    parser.add_argument("--gcn_dropout", type=float, default=0,
                        help="dropout rate for GNN layers. Type: float")
    parser.add_argument("--mlp_dropout", type=float, default=0,
                        help="dropout rate for mlp. Type: float")
    parser.add_argument("--weight_decay", type=float, default=0,
                        help="weight decay. Type: float")
    parser.add_argument("--model_saving_dir", type=str,
                        default="../models/asap7-designs",
                        help="the directory to save the trained model. Type: str")
    parser.add_argument("--preprocess", action="store_true",
                        help="run the preprocess procedure (dataset generation + "
                             "model init) instead of normal training")
    parser.add_argument("--n_fcn", type=int, default=3,
                        help="the number of fully connected layers of the mlp. Type: int")
    parser.add_argument("--alpha", type=float, default=1.0,
                        help="the weight of the cost-sensitive learning. Type: float")
    parser.add_argument("--change_lr", action="store_true",
                        help="override the checkpointed learning rate on resume")
    parser.add_argument("--change_alpha", action="store_true",
                        help="override the checkpointed alpha on resume")
    parser.add_argument("--gpu", type=int, default=0,
                        help="index of the accelerator chip. Type: int")
    parser.add_argument("--nlabels", type=int, default=1,
                        help="number of prediction classes. Type: int")
    parser.add_argument("--os_rate", type=int, default=1,
                        help="the oversampling rate. Type: int")
    parser.add_argument("--beta", type=float, default=0.5,
                        help="threshold for binary classification to trade off "
                             "recall and precision. Type: float")
    parser.add_argument("--data_save_path", type=str,
                        default="../datasets/asap7-designs",
                        help="the directory that contains the dataset. Type: str")
    parser.add_argument("--rawdata_path", type=str, default="../rawdata/example")
    parser.add_argument("--predict_path", type=str,
                        default="../prediction/example",
                        help="the directory used to save the prediction result. Type: str")
    parser.add_argument("--droplast", action="store_true")
    parser.add_argument("--feat_reduce", type=int, nargs="+", default=[6, 1])
    parser.add_argument("--no_cnn", action="store_true")
    parser.add_argument("--no_gnn", action="store_true")
    parser.add_argument("--masking", type=str, default="critical")
    parser.add_argument("--design", type=str)
    parser.add_argument("--unet", action="store_true",
                        help="use the U-Net architecture for the layout branch")
    parser.add_argument("--pooling", type=str, default="max",
                        help="the pooling type for layoutnet")
    parser.add_argument("--norm", action="store_true",
                        help="min-max normalize the input features")
    parser.add_argument("--task", type=str, default="reg",
                        help="classification or regression task, valid: ['cls','reg']")
    parser.add_argument("--attn", action="store_true",
                        help="apply the attention mechanism in the GNN")
    parser.add_argument("--num_heads", type=int, default=1,
                        help="the number of heads for the attention mechanism "
                             "(GAT-style per-head softmax over the mailbox, "
                             "heads concatenated; must divide --out_dim. The "
                             "reference declares this flag but its multi-head "
                             "path does not exist — this is a working "
                             "implementation of the declared surface)")
    # Commented-out in the reference (src/options.py:31,37-38) but part
    # of its historical CLI surface — accepted here as no-ops so older
    # experiment scripts that still pass them don't crash argparse.
    parser.add_argument("--balanced", action="store_true",
                        help="accepted for script compatibility; no-op "
                             "(commented out in the reference)")
    parser.add_argument("--data_info_txt", type=str, default=None,
                        help="accepted for script compatibility; no-op "
                             "(commented out in the reference)")
    parser.add_argument("--data_usage", type=str, default=None,
                        help="accepted for script compatibility; no-op "
                             "(commented out in the reference)")

    # --- TPU-native additions (not in the reference) ---
    tpu = parser.add_argument_group("tpu", "TPU-native options (additive)")
    tpu.add_argument("--mesh_shape", type=int, nargs="+", default=None,
                     help="device mesh shape for data-parallel training, "
                          "e.g. --mesh_shape 8. Default: all visible devices.")
    tpu.add_argument("--dp", action="store_true",
                     help="enable shard_map data parallelism over the path batch")
    tpu.add_argument("--compute_dtype", type=str, default="float32",
                     choices=["float32", "bfloat16"],
                     help="dtype for GNN/CNN activations")
    tpu.add_argument("--merge_designs", action="store_true",
                     help="train on ONE super-graph merging all train "
                          "designs (disjoint union per topo level): one "
                          "shared level scan propagates every design per "
                          "step, batches draw from each design's path "
                          "universe (grouped rows). Validation stays "
                          "per-design. The TPU-fast multi-design layout "
                          "(vmap-free).")
    tpu.add_argument("--compile_cache_dir", type=str,
                     default=compile_cache_dir(),
                     help="persistent XLA compilation cache directory "
                          "(repeat runs skip recompiles — the unrolled "
                          "--exact_levels graph can cost minutes to compile "
                          "on slow hosts). Shared with bench/driver entry "
                          "points; env override PRTP_XLA_CACHE_DIR. "
                          "Empty string disables.")
    tpu.add_argument("--pallas", action="store_true",
                     help="deprecated no-op (the Pallas kernel path was "
                          "retired in round 2 with a measured cost-model "
                          "rationale, see MODEL_NOTES.md; accepted so "
                          "older invocations don't crash argparse)")
    tpu.add_argument("--exact_levels", action="store_true",
                     help="pack each design with true per-level shapes and "
                          "python-unroll the GNN (no padded compute; fastest "
                          "per design, one compile per design shape — "
                          "disables cross-design bucketing)")
    tpu.add_argument("--scan_groups", type=int, default=1,
                     help="partition GNN level pairs into N contiguous "
                          "groups, each padded to its own maxima and run "
                          "as one lax.scan — the middle ground between "
                          "the single padded scan (N=1, one compiled "
                          "body, most padded compute) and --exact_levels "
                          "(no padding, slowest compile). N=0 picks the "
                          "smallest N whose padded compute is within 15%% "
                          "of exact automatically. Disables cross-design "
                          "bucketing when N!=1; ignored under "
                          "--exact_levels")
    tpu.add_argument("--flat_adam", action="store_true",
                     help="run Adam over ONE concatenated parameter vector "
                          "instead of one update kernel per param leaf — "
                          "identical math (elementwise; see "
                          "trainer.make_flat_adam), fewer launched regions "
                          "on the kernel-launch-bound train step. The "
                          "checkpoint records this flag; resume/test honor "
                          "the saved value (opt-state structure differs)")
    tpu.add_argument("--gnn_unroll", type=int, default=1,
                     help="lax.scan unroll factor over GNN level pairs; "
                          "0 = fully unroll (fastest on kernel-launch-bound "
                          "chips, higher compile time)")
    tpu.add_argument("--seed", type=int, default=9294,
                     help="RNG seed (reference hardcodes 9294 at src/train.py:596)")
    tpu.add_argument("--max_steps", type=int, default=None,
                     help="optional hard cap on optimizer steps (smoke tests)")
    tpu.add_argument("--val_interval", type=int, default=50,
                     help="validate every N batches (reference: 50, src/train.py:566)")
    tpu.add_argument("--steps_per_dispatch", type=int, default=8,
                     help="optimizer steps (distinct shuffled batches) rolled "
                          "into one device dispatch via lax.scan; amortizes "
                          "dispatch latency. 1 = strict per-batch dispatch. "
                          "Validation triggers align to dispatch boundaries.")
    tpu.add_argument("--debug_nans", action="store_true",
                     help="raise on NaN/Inf in any computation (analogue of "
                          "the reference's set_detect_anomaly, src/train.py:452)")
    tpu.add_argument("--profile_dir", type=str, default=None,
                     help="write a jax.profiler trace of the train loop here")
    tpu.add_argument("--preprocess_workers", type=int, default=1,
                     help="parallel worker processes for dataset generation "
                          "(designs are independent; reference is serial). "
                          "Spawn startup is ~3s/worker — worth it for "
                          "minutes-long designs, not tiny ones.")

    options = parser.parse_args(args)
    if options.pallas:
        import warnings
        warnings.warn(
            "--pallas is a deprecated no-op: the Pallas kernel path was "
            "retired (MODEL_NOTES.md, 'Pallas retirement'); the fused "
            "whole-propagation VJP is the default fast path.",
            stacklevel=2)
    return options
