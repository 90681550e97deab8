"""Chunked streaming decode == full decode (bit-exact with sufficient halo)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from test_model_parity import TINY
from vits_tpu.models.synthesizer import Synthesizer


def test_stream_decode_matches_full():
    synth = Synthesizer(**TINY)
    params = synth.init_params(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    z = jnp.asarray(rng.randn(2, 100, TINY["inter_channels"]).astype(np.float32))
    g = synth.emb_g.apply(params["emb_g"], jnp.asarray([0, 1]))
    full = synth.dec.apply(params["dec"], z, g=g)
    streamed = synth.stream_decode(params, z, g=g, chunk_frames=32, halo=24)
    assert streamed.shape == full.shape
    np.testing.assert_allclose(np.asarray(streamed), np.asarray(full), atol=1e-6)


def test_stream_decode_insufficient_halo_differs():
    """Sanity: with halo=0 the chunk seams must show (confirms the halo is
    doing real work, not testing a no-op)."""
    synth = Synthesizer(**TINY)
    params = synth.init_params(jax.random.PRNGKey(0))
    rng = np.random.RandomState(1)
    z = jnp.asarray(rng.randn(1, 96, TINY["inter_channels"]).astype(np.float32))
    g = synth.emb_g.apply(params["emb_g"], jnp.asarray([0]))
    full = synth.dec.apply(params["dec"], z, g=g)
    streamed = synth.stream_decode(params, z, g=g, chunk_frames=32, halo=0)
    assert float(jnp.abs(streamed - full).max()) > 1e-4
