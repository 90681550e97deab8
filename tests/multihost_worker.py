"""Worker process for tests/test_multihost.py.

One of N `jax.distributed` CPU processes (4 virtual devices each). Assembles
the global batch from its per-process local shard via
`parallel.mesh.local_batch_to_global` — the multi-host feed path used by
`train/loop.py::run` (reference semantics: DistributedBucketSampler rank
striding, data_utils.py:231, + DDP allreduce, train.py:50,116-118) — and runs
one data-parallel train step, printing the resulting generator loss.

Not a test module; launched by subprocess with args: pid nproc port [variant].
"""
import os
import sys


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    variant = sys.argv[4] if len(sys.argv) > 4 else "mel"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(f"localhost:{port}", num_processes=nproc,
                               process_id=pid)
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_train_step import build, make_batch

    from vits_tpu.parallel.mesh import (local_batch_to_global, make_mesh,
                                        make_sharded_train_step, replicate)

    step, state = build(variant)
    mesh = make_mesh()
    n_global = len(jax.devices())
    assert jax.process_count() == nproc and n_global == 4 * nproc
    # every process builds the same deterministic global batch, then keeps
    # only the rows its local devices own (contiguous batch-dim sharding)
    gbatch = {k: np.asarray(v) for k, v in make_batch(B=n_global, seed=5).items()}
    lo, hi = pid * 4, (pid + 1) * 4
    local = {k: v[lo:hi] for k, v in gbatch.items()}
    sb = local_batch_to_global(mesh, local)
    for k, v in sb.items():
        assert v.shape == gbatch[k].shape, (k, v.shape, gbatch[k].shape)
    st = replicate(mesh, state)
    sstep = make_sharded_train_step(step, mesh)
    st, m = sstep(st, sb, jax.random.PRNGKey(1), 2e-4, 2e-4, 0.01, 1e-4)
    print(f"LOSS {float(jax.device_get(m['loss_g_total'])):.6f}", flush=True)


if __name__ == "__main__":
    main()
