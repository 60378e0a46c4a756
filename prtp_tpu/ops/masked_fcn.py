"""Masked feature-map products for the layout (CNN) fusion branch.

The reference computes, per path p in a level batch,
``path_map[p] = mask[p].to_dense() * feat_map`` (a dense
``(n_paths, map_size^2)`` product, ``src/train.py:500-501``) followed by
``fcn`` = Linear(map_size^2 -> cnn_outdim) (``src/train.py:71``).

TPU design: path masks live device-resident as a dense uint8 matrix
``(num_paths, map_size^2)`` (sparse COO is rasterized host-side once per
design). A batch step gathers mask rows, multiplies by the broadcast
feature map, and feeds one large ``(P, 16384) @ (16384, 128)`` matmul —
MXU-shaped work instead of per-level host->device sparse transfers.
"""

from __future__ import annotations



def masked_feature_rows(masks_u8, path_ids, feat_map):
    """Gather mask rows and modulate by the flattened CNN feature map.

    Args:
      masks_u8: (num_paths, M) uint8 or bool device array of path masks.
      path_ids: (P,) int32 path indices (padded entries may repeat row 0;
        callers mask the loss instead).
      feat_map: (M,) float feature map (flattened CNN output).

    Returns:
      (P, M) float array ``mask[p] * feat_map``.
    """
    rows = masks_u8[path_ids].astype(feat_map.dtype)
    return rows * feat_map[None, :]
