"""Model-axis (tensor-parallel) decoder sharding: sharded inference matches
the replicated computation on the virtual CPU mesh."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from test_model_parity import TINY
from vits_tpu.models.synthesizer import Synthesizer
from vits_tpu.parallel.mesh import (
    make_mesh, generator_param_specs, shard_generator_params, make_tp_infer)
from vits_tpu.ops.seq import infer_path


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_tp_decoder_inference_matches():
    synth = Synthesizer(**TINY)
    params = synth.init_params(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    T_x, T_y = 12, 40
    x = jnp.asarray(rng.randn(1, T_x, TINY["text_channels"]).astype(np.float32))
    emo = jnp.asarray(rng.randn(1, 1024).astype(np.float32))
    sid = jnp.asarray([1], jnp.int32)
    noise = jnp.asarray(rng.randn(1, T_y, TINY["inter_channels"]).astype(np.float32))
    dur = jnp.full((1, T_x), T_y // T_x + 1, jnp.float32)
    attn = infer_path(dur, T_y)

    m_p, s_p, logw, g = synth.infer_p1(params, x, emo, sid)
    ref = synth.infer_p2(params, attn, m_p, s_p, g, noise)

    mesh = make_mesh(data=2, model=4)
    # some dec kernels actually get sharded (min_channels lowered for tiny net)
    specs = generator_param_specs(params, mesh, min_channels=32)
    sharded_leaves = [s for s in jax.tree_util.tree_leaves(
        specs, is_leaf=lambda x: hasattr(x, "spec")) if s.spec != ()]
    assert len(sharded_leaves) > 0

    sp = jax.tree_util.tree_map(jax.device_put, params, specs)
    rep = jax.NamedSharding(mesh, jax.sharding.PartitionSpec())
    fn = jax.jit(lambda p, a, m, s, g, n: synth.infer_p2(p, a, m, s, g, n),
                 in_shardings=(specs, rep, rep, rep, rep, rep),
                 out_shardings=rep)
    got = fn(sp, attn, m_p, s_p, g, noise)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)
