"""Data-parallel training on the virtual 8-device CPU mesh: sharded step
matches the single-device step bit-for-bit (GSPMD preserves semantics)."""
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 1)[0])
import test_train_step as T  # tiny model builders

from vits_tpu.parallel.mesh import (
    make_mesh, make_sharded_train_step, replicate, shard_batch)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_step_matches_single_device():
    step, state = T.build("mel")
    batch = T.make_batch(B=8)
    rng = jax.random.PRNGKey(0)

    s1, m1 = jax.jit(step)(jax.tree_util.tree_map(jnp.copy, state), batch, rng, 2e-4, 2e-4, 0.01)

    mesh = make_mesh(data=8)
    sstep = make_sharded_train_step(step, mesh)
    st = replicate(mesh, jax.tree_util.tree_map(jnp.copy, state))
    sb = shard_batch(mesh, batch)
    s2, m2 = sstep(st, sb, rng, 2e-4, 2e-4, 0.01)

    for k in ("loss_disc", "loss_g_total", "loss_mel", "grad_norm_g"):
        np.testing.assert_allclose(float(m1[k]), float(m2[k]), rtol=2e-4, atol=1e-5)
    # params identical too
    # Params: Adam's first-step update is sign(g)*lr for tiny grads, so fp32
    # reduction-order differences across shardings can flip updates by up to
    # 2*lr on near-zero-grad leaves. Bound by a few lr, not exact equality.
    l1 = jax.tree_util.tree_leaves(s1["gen"])
    l2 = jax.tree_util.tree_leaves(s2["gen"])
    worst = max(float(jnp.abs(a - b).max()) for a, b in zip(l1, l2))
    assert worst < 5e-3, worst


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_two_sharded_steps_run():
    step, state = T.build("mel")
    mesh = make_mesh(data=8)
    sstep = make_sharded_train_step(step, mesh)
    st = replicate(mesh, state)
    for i in range(2):
        sb = shard_batch(mesh, T.make_batch(B=8, seed=i))
        st, m = sstep(st, sb, jax.random.PRNGKey(i), 2e-4, 2e-4, 0.01)
    assert np.isfinite(float(m["loss_g_total"]))
    assert int(st["step"]) == 2
