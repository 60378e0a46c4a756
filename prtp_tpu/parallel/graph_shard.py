"""Graph-dimension (edge-parallel) sharding for very large designs.

SURVEY.md §5: "the TPU analogue of scaling length is scaling graph
size: ... for 100k+-cell designs, sharding the per-level edge lists
across chips". Here the per-level-pair edge tables (``cell_src``,
``cell_dst_slot``, ``net_src``, ``net_dst_slot`` — the (P, Pe) arrays)
are sharded along the edge axis of a ``gp`` mesh axis while node state,
features and parameters stay replicated; XLA's SPMD partitioner turns
the segment reductions into per-shard partial scatters + ``psum`` over
ICI. Composes with batch data parallelism on a 2-D (dp, gp) mesh.

This is the jit+NamedSharding formulation (annotate and let XLA insert
collectives); correctness is validated on the virtual CPU mesh, and the
explicit shard_map variant in dp.py documents the collective pattern.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
import numpy as np
import optax

from ..graph import DesignData, LeveledGraph, LeveledGraphGrouped
from ..trainer import TrainState, _forward, _task_loss_and_metrics

GP_AXIS = "gp"
DP_AXIS = "dp"


def make_2d_mesh(n_dp: int, n_gp: int) -> Mesh:
    devices = jax.devices()
    need = n_dp * n_gp
    if len(devices) < need:
        raise RuntimeError(f"need {need} devices, have {len(devices)}")
    return Mesh(np.array(devices[:need]).reshape(n_dp, n_gp),
                (DP_AXIS, GP_AXIS))


def _graph_shardings(mesh: Mesh, gp_axis: str):
    repl = NamedSharding(mesh, P())
    edge = NamedSharding(mesh, P(None, gp_axis))
    return LeveledGraph(
        cell_feat_lvl=repl, net_feat_lvl=repl,
        cell_src=edge, cell_dst_slot=edge,
        net_src=edge, net_dst_slot=edge, net_cnt=repl,
        cell_mail=repl, net_mail=repl,
        cell_rev_pos=repl, cell_rev_rows=repl,
        net_rev_pos=repl, net_rev_rows=repl,
    )


def design_shardings(mesh: Mesh, gp_axis: str = GP_AXIS,
                     with_patches: bool = True, graph=None):
    """NamedSharding pytree for DesignData: edge tables sharded along the
    edge axis on ``gp``, everything else replicated. ``with_patches``
    must match whether the design carries a ``cnn_patches`` table, and
    ``graph`` the design's graph container when it is a grouped-scan
    :class:`LeveledGraphGrouped` (its static fields are pytree aux data,
    so the sharding container must carry the SAME values) — the sharding
    pytree must mirror the design's structure exactly."""
    repl = NamedSharding(mesh, P())
    if isinstance(graph, LeveledGraphGrouped):
        # grouped-scan container: each group's edge tables shard the
        # same way (the per-group tables are just (Pg, Pe_g) slices)
        n = len(graph.groups)
        graph_sh = LeveledGraphGrouped(
            groups=tuple(_graph_shardings(mesh, gp_axis)
                         for _ in range(n)),
            group_pair_idx=(repl,) * n,
            group_cell_off=(repl,) * n,
            group_net_off=(repl,) * n,
            num_rows_static=graph.num_rows_static,
        )
    else:
        graph_sh = _graph_shardings(mesh, gp_axis)
    return DesignData(
        graph=graph_sh, arrival_time=repl, required_time=repl,
        is_critical=repl, path_endpoint=repl, path_level=repl,
        path_masks=repl, cnn_input=repl,
        cnn_patches=repl if with_patches else None,
    )


def shard_design(mesh: Mesh, design: DesignData,
                 gp_axis: str = GP_AXIS) -> DesignData:
    """Place a packed design with edge tables sharded over ``gp``.

    Edge table widths must be divisible by the gp mesh size (the packer
    aligns them to 128, so any power-of-two gp size works).
    """
    sh = design_shardings(
        mesh, gp_axis, with_patches=design.cnn_patches is not None,
        graph=design.graph)
    return jax.tree_util.tree_map(jax.device_put, design, sh)


def make_graph_sharded_train_step(model, tx, mesh: Mesh,
                                  task: str = "reg",
                                  batch_axis: str | None = DP_AXIS,
                                  gp_axis: str = GP_AXIS,
                                  donate: bool = True,
                                  with_patches: bool = True,
                                  graph=None):
    """Train step jitted over a (dp, gp) mesh: path batch sharded on dp,
    edge tables sharded on gp, state replicated.

    The model should use ``gnn_reduce='segment'`` so the reductions run
    over the (sharded) flat edge tables; the default dense-mailbox
    reduce is node-indexed and would simply replicate."""

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
        return state.replace(params=new_params, batch_stats=new_stats,
                             opt_state=new_opt, step=state.step + 1), mets

    repl = NamedSharding(mesh, P())
    batch_sh = (NamedSharding(mesh, P(batch_axis)) if batch_axis else repl)
    design_sh = design_shardings(mesh, gp_axis, with_patches=with_patches,
                                 graph=graph)
    return jax.jit(
        step_fn,
        in_shardings=(repl, design_sh, batch_sh, batch_sh),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate else (),
    )
