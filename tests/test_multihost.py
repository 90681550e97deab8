"""Multi-host data feeding: two `jax.distributed` CPU processes (4 devices
each) must assemble the global batch from per-process shards
(`local_batch_to_global`) and agree on the train-step loss with a
single-process run over the same 8-device mesh and global batch.

This is the test the reference cannot express (it relies on torchrun+NCCL);
semantics covered: rank-strided data sharding (data_utils.py:231) feeding one
SPMD step whose gradient reduction spans processes (train.py:116-118).
"""
import os
import re
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
@pytest.mark.parametrize("variant", ["mel", "stft"])
def test_two_process_feed_matches_single_process(variant):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo, "tests", "multihost_worker.py")
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = repo
    env.pop("XLA_FLAGS", None)  # worker sets its own 4-device count
    procs = [subprocess.Popen([sys.executable, worker, str(i), "2", str(port),
                               variant],
                              stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                              env=env, text=True)
             for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append(out)
        assert p.returncode == 0, out[-2000:]
    losses = [float(m.group(1)) for out in outs
              for m in [re.search(r"LOSS ([-\d.]+)", out)] if m]
    assert len(losses) == 2, outs
    assert losses[0] == losses[1]

    # single-process reference over the same logical 8-device mesh
    from tests.test_train_step import build, make_batch
    from vits_tpu.parallel.mesh import (make_mesh, make_sharded_train_step,
                                        replicate, shard_batch)
    step, state = build(variant)
    mesh = make_mesh()
    assert len(jax.devices()) == 8
    batch = make_batch(B=8, seed=5)
    sb = shard_batch(mesh, batch)
    st = replicate(mesh, state)
    sstep = make_sharded_train_step(step, mesh)
    _, m = sstep(st, sb, jax.random.PRNGKey(1), 2e-4, 2e-4, 0.01, 1e-4)
    ref = float(jax.device_get(m["loss_g_total"]))
    np.testing.assert_allclose(losses[0], ref, rtol=2e-4)


@pytest.mark.slow
def test_scaling_harness_cpu_mesh(tmp_path):
    """scripts/bench_scaling.py runs both legs (1 and 2 processes) on the
    virtual CPU mesh and computes a scaling efficiency — validating the pod
    harness end-to-end; the asserted property is that the efficiency is a
    real number computed from two real runs, NOT that it reaches 80% (CPU
    thread oversubscription makes the ratio meaningless here; the pod number
    awaits multi-host hardware, BASELINE.md)."""
    import sys as _sys
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    _sys.path.insert(0, os.path.join(repo, "scripts"))
    import bench_scaling
    row = bench_scaling.main([
        "--tiny", "--nproc", "2", "--steps", "6", "--batch", "2",
        "--cpu-devices", "2", "--workdir", str(tmp_path), "--timeout", "900"])
    assert row["metric"] == "train_mel_scaling_efficiency"
    assert np.isfinite(row["value"]) and row["value"] > 0
    assert row["audio_sec_per_s_1proc"] > 0
    assert row["audio_sec_per_s_per_proc_nproc"] > 0
    assert row["global_audio_sec_per_s_nproc"] == pytest.approx(
        row["audio_sec_per_s_per_proc_nproc"] * 2)
