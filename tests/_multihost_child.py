"""Child process for the 2-process multi-host test (test_multihost.py).

Usage:
  python _multihost_child.py <process_id> <coordinator_port>   # cluster
  python _multihost_child.py ref                               # 1-process

Cluster mode joins a 2-process jax.distributed cluster via the SAME
env-gated entry the CLIs use
(`prtp_tpu.parallel.distributed.maybe_initialize`), 2 CPU devices per
process. Ref mode runs the identical step single-process on 4 local
devices. Both build the tiny flagship deterministically, run ONE dp
train step over the global 4-device mesh, and print a machine-checkable
RESULT line (loss + parameter checksum).
"""

import os
import sys


def run_step():
    import jax
    import numpy as np

    from prtp_tpu.data.random_design import make_random_design
    from prtp_tpu.graph import pack_design
    from prtp_tpu.models import PathModel
    from prtp_tpu.parallel import make_dp_train_step, make_mesh, shard_batch
    from prtp_tpu.parallel.mesh import replicated
    from prtp_tpu.trainer import init_state, make_optimizer, pad_batch

    parsed = make_random_design([16, 24, 16, 8], cell_feat_dim=12,
                                net_feat_dim=3, map_size=16, cnn_hw=64,
                                seed=3)
    design = pack_design(parsed, map_size=16)
    model = PathModel(out_dim=16, hidden_dim=32, cnn_outdim=8, map_size=16,
                      global_dim=8)
    tx = make_optimizer(1e-3)
    state = init_state(model, tx, design, jax.random.PRNGKey(0))

    mesh = make_mesh(4)  # all 4 global devices on the dp axis
    repl = replicated(mesh)
    # every process holds the same host values; device_put with a global
    # sharding places each process's addressable shards
    state = jax.device_put(state, repl)
    design = jax.device_put(design, repl)
    ids, mask = pad_batch(
        np.arange(min(16, design.num_paths), dtype=np.int64), 16)
    sids, smask = shard_batch(mesh, ids, mask)

    step = make_dp_train_step(model, tx, mesh, donate=False)
    new_state, mets = step(state, design, sids, smask)
    jax.block_until_ready(new_state.params)

    loss = float(np.asarray(mets["loss"]))  # replicated -> addressable
    leaves = jax.tree_util.tree_leaves(new_state.params)
    checksum = float(sum(np.abs(np.asarray(l, np.float64)).sum()
                         for l in leaves))
    print(f"RESULT pid={jax.process_index()} nproc={jax.process_count()} "
          f"ndev={jax.device_count()} loss={loss:.8f} "
          f"checksum={checksum:.8f}", flush=True)


def main():
    os.environ["JAX_PLATFORMS"] = "cpu"
    if sys.argv[1] == "ref":
        os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
        import jax
        assert jax.device_count() == 4
    else:
        pid, port = int(sys.argv[1]), sys.argv[2]
        os.environ["PRTP_COORDINATOR"] = f"localhost:{port}"
        os.environ["PRTP_NUM_PROCESSES"] = "2"
        os.environ["PRTP_PROCESS_ID"] = str(pid)
        os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

        from prtp_tpu.parallel.distributed import maybe_initialize
        assert maybe_initialize(), "env-gated init did not trigger"

        import jax
        assert jax.process_count() == 2, jax.process_count()
        assert jax.device_count() == 4, \
            "global mesh must span both processes"
        assert jax.local_device_count() == 2
    run_step()


if __name__ == "__main__":
    main()
