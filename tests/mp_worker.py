"""Worker for tests/test_multiprocess.py — one OS process of a 2-process
jax.distributed CPU cluster (gloo cross-host collectives).

Exercises the real multi-HOST path behind the CLIs' `--multihost` flag
(cli/train.py::_maybe_init_multihost, cli/demo.py): the CLI's no-arg
`jax.distributed.initialize()` is the same rendezvous with TPU-pod
coordinator auto-discovery; here the coordinator is passed explicitly
because a CPU test box advertises no cluster environment. After init,
the GLOBAL device view + the repo's own mesh/sharding utilities
(parallel/mesh.py) drive a dp-across-processes computation whose numeric
result proves the cross-process all-reduce actually happened.

Replaces: the reference's per-GPU process spawn + DDP rendezvous
(train.py:202-210, demo.py:196-207) — here every process runs the same
SPMD program and XLA inserts the collectives.
"""

import sys


def main() -> None:
    idx, port = int(sys.argv[1]), sys.argv[2]

    import jax

    # Same dance as tests/conftest.py: the axon sitecustomize overrides
    # JAX_PLATFORMS at interpreter start, so force CPU via the config.
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=idx
    )

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from mvdfusion_tpu.parallel.mesh import (
        data_sharding, make_mesh, param_shardings, replicated,
    )

    # The CLI gates checkpoint/log ownership on process_index() == 0.
    assert jax.process_index() == idx
    assert jax.local_device_count() == 2
    assert jax.device_count() == 4

    # 2 hosts x 2 devices -> (dp=2, tp=2): dp crosses the process boundary
    # (global device order is proc0's pair then proc1's), tp stays host-local
    # — the layout the ICI/DCN split wants on real pods.
    mesh = make_mesh(dp=2, tp=2)
    assert mesh.devices.shape == (2, 2)
    assert {d.process_index for d in mesh.devices[:, 0].flat} == {0, 1}

    # Megatron rules on a toy param tree: column/row-parallel kernels shard
    # over tp, everything else replicates.
    params = {
        "blk": {
            "to_q": {"kernel": jnp.zeros((8, 8)), "bias": jnp.zeros((8,))},
            "to_out": {"kernel": jnp.zeros((8, 8))},
        }
    }
    sh = param_shardings(params, mesh)
    assert sh["blk"]["to_q"]["kernel"].spec == P(None, "tp")
    assert sh["blk"]["to_out"]["kernel"].spec == P("tp", None)

    # dp-sharded batch built from PROCESS-LOCAL data (the multi-host analog
    # of the per-rank dataloader shard), then a jit whose output must mix
    # BOTH processes' contributions: grad of the dp-mean loss w.r.t. a
    # replicated weight — the partitioner's cross-process psum.
    local = np.full((1, 4), 1.0 + idx, np.float32)  # proc0: 1s, proc1: 2s
    batch = jax.make_array_from_process_local_data(
        data_sharding(mesh), local, global_shape=(2, 4)
    )
    w = jax.device_put(jnp.ones((4,)), replicated(mesh))

    def loss(w, b):
        return jnp.mean(jnp.sum(b * w, axis=-1))

    g = jax.jit(
        jax.grad(loss), out_shardings=replicated(mesh)
    )(w, batch)
    # d loss/d w_j = mean over the GLOBAL batch of b[:, j] = (1 + 2)/2: the
    # 1.5 is only reachable by summing across the process boundary.
    np.testing.assert_allclose(np.asarray(g), np.full((4,), 1.5), atol=1e-6)
    print(f"proc{idx} MP-OK", flush=True)


if __name__ == "__main__":
    main()
