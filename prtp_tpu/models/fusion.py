"""PathModel — the multimodal fusion head.

The reference's ``PathModel`` has a constructor/usage mismatch
(``src/model.py:256-257`` declares 6 modules; ``src/train.py:81`` passes
3) and a 64-vs-32 global-width inconsistency (``src/train.py:76`` vs
``src/model.py:267``). This rebuild implements the *effective* model —
``(gnn, fcn, mlp_fuse, mlp_alpha)`` — with one consistent global
embedding width of 64 (matching the declared fuse width), per
MODEL_NOTES.md.

Forward (reference src/model.py:269-292, batched over all endpoints of
a batch at once instead of per-level calls):
  h_gnn    = gnn(graph)[endpoints]
  h_cnn    = fcn(mask[p] * flatten(cnn(layout)))
  h_global = mlp_alpha(level_of_path)
  out      = mlp_fuse(concat(h_gnn, h_cnn, h_global))
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from ..graph import DesignData
from .gnn import TimeGNN
from .layoutnet import LayoutNet
from .unet import UNet
from .mlp import MLP


class PathModel(nn.Module):
    use_gnn: bool = True
    use_cnn: bool = True
    unet: bool = False
    pooling: str = "max"
    out_dim: int = 128
    hidden_dim: int = 256
    cnn_outdim: int = 128
    map_size: int = 128
    global_dim: int = 64
    nlabels: int = 1
    flag_attn: bool = False
    num_heads: int = 1
    gnn_unroll: int | bool = 1
    gnn_reduce: str = "mailbox"  # 'mailbox' | 'segment'
    dgl_parity: bool = True  # exact DGL pull semantics (models.gnn)
    gnn_fused_vjp: bool = True  # hand-written exact-levels backward
    # Mixed-precision compute dtype (flax style: params stay f32, inputs
    # and params are cast for the matmuls/convs — bf16 runs the MXU at
    # full rate vs the f32 3-pass lowering). Threaded through the CNN
    # branch, the fusion head, the scan/grouped GNN MLPs, and the
    # exact-path fused-VJP GNN's matmuls (bf16 operands, f32
    # accumulation). Output is cast back to f32.
    compute_dtype: Any = None

    def setup(self):
        assert self.use_gnn or self.use_cnn, \
            "GNN and CNN model can not be both None!"
        if self.use_gnn:
            self.gnn = TimeGNN(
                out_dim=self.out_dim,
                hidden_dim=self.hidden_dim,
                flag_attn=self.flag_attn,
                num_heads=self.num_heads,
                unroll=self.gnn_unroll,
                reduce_mode=self.gnn_reduce,
                dgl_parity=self.dgl_parity,
                fused_vjp=self.gnn_fused_vjp,
                mlp_dtype=self.compute_dtype,
            )
        if self.use_cnn:
            self.cnn = (UNet(self.pooling, dtype=self.compute_dtype)
                        if self.unet
                        else LayoutNet(self.pooling,
                                       dtype=self.compute_dtype))
            # Linear(map^2 -> cnn_outdim) (src/train.py:71), applied via
            # the algebra fcn(mask * f) = mask @ (f[:,None] * W) + b so
            # the uint8 mask rows feed the MXU directly (no (B, map^2)
            # float elementwise product materialized per batch)
            msq = self.map_size * self.map_size
            self.fcn_kernel = self.param(
                "fcn_kernel", nn.initializers.xavier_uniform(),
                (msq, self.cnn_outdim))
            self.fcn_bias = self.param(
                "fcn_bias", nn.initializers.zeros, (self.cnn_outdim,))
        self.mlp_alpha = MLP((self.global_dim * 2, self.global_dim),
                             dtype=self.compute_dtype)
        fuse_in = ((self.out_dim if self.use_gnn else 0)
                   + (self.cnn_outdim if self.use_cnn else 0)
                   + self.global_dim)
        # mlp = MLP(mlp_dim, mlp_dim*2, nlabels), src/train.py:77
        self.mlp_fuse = MLP((fuse_in * 2, self.nlabels),
                            dtype=self.compute_dtype)

    def __call__(self, design: DesignData, path_ids, train: bool = False):
        """Predict for a batch of path ids.

        Args:
          design: device-resident DesignData.
          path_ids: (B,) int32 path indices (padded entries allowed —
            mask the loss on the caller side). For a merged super-graph
            (``graph.merge_parsed_designs``), shape (K, Bk) where row k
            holds only design-k path ids; the K CNN rasters are run as
            one batched conv and row k reads feature map k.
          train: BatchNorm mode for the U-Net branch.

        Returns: output shaped like ``path_ids`` (nlabels=1) or
        ``path_ids.shape + (nlabels,)`` logits.
        """
        grouped = path_ids.ndim == 2
        endpoints = design.path_endpoint[path_ids]
        levels = design.path_level[path_ids]
        parts = []
        if self.use_gnn:
            h = self.gnn(design.graph)
            parts.append(h[endpoints])
        if self.use_cnn:
            if self.unet:
                feat_map = self.cnn(design.cnn_input, train=train)
            else:  # LayoutNet: static-raster im2col fast path when packed
                feat_map = self.cnn(design.cnn_input, train=train,
                                    patches=design.cnn_patches)
            rows = design.path_masks[path_ids].astype(feat_map.dtype)
            fcn_kernel = self.fcn_kernel
            fcn_bias = self.fcn_bias
            if self.compute_dtype is not None:
                fcn_kernel = fcn_kernel.astype(self.compute_dtype)
                fcn_bias = fcn_bias.astype(self.compute_dtype)
                rows = rows.astype(self.compute_dtype)
                feat_map = feat_map.astype(self.compute_dtype)
            if grouped:
                # (K, map^2) per-design maps; per-design fcn algebra
                # batched on the MXU: fcn(mask * f_k) = mask @ (f_k ⊙ W)
                fmap = feat_map.reshape(feat_map.shape[0], -1)
                fw = fmap[:, :, None] * fcn_kernel  # (K, map^2, D)
                parts.append(jnp.einsum("kbm,kmd->kbd", rows, fw)
                             + fcn_bias)
            else:
                if feat_map.shape[0] != 1:
                    raise ValueError(
                        "merged super-graph designs (K CNN rasters) need "
                        "grouped path_ids of shape (K, Bk); got flat ids "
                        f"with {feat_map.shape[0]} rasters")
                fw = feat_map.reshape(-1)[:, None] * fcn_kernel
                parts.append(rows @ fw + fcn_bias)
        parts.append(self.mlp_alpha(levels[..., None].astype(jnp.float32)))
        if self.compute_dtype is not None:
            parts = [p.astype(self.compute_dtype) for p in parts]
        hcat = jnp.concatenate(parts, axis=-1)
        out = self.mlp_fuse(hcat)
        if self.nlabels == 1:
            out = out.squeeze(-1)
        return out.astype(jnp.float32)


def model_from_options(options):
    """Build a PathModel from the parity CLI options (src/train.py:34-81)."""
    nh = getattr(options, "num_heads", 1)
    if nh > 1 and options.out_dim % nh != 0:
        raise ValueError(
            f"--num_heads {nh} must divide --out_dim {options.out_dim} "
            "(heads read disjoint out_dim/num_heads value slices)")
    unroll = getattr(options, "gnn_unroll", 1)
    unroll = True if unroll == 0 else unroll
    cdtype = (jnp.bfloat16
              if getattr(options, "compute_dtype", "float32") == "bfloat16"
              else None)
    return PathModel(
        compute_dtype=cdtype,
        gnn_unroll=unroll,
        use_gnn=not options.no_gnn,
        use_cnn=not options.no_cnn,
        unet=options.unet,
        pooling=options.pooling,
        out_dim=options.out_dim,
        hidden_dim=options.hidden_dim,
        cnn_outdim=options.cnn_outdim,
        map_size=options.map_size,
        nlabels=options.nlabels,
        flag_attn=options.attn,
        num_heads=options.num_heads,
        dgl_parity=getattr(options, "dgl_parity", True),
    )
