"""Fused Pallas int8 ResBlock2 chain == the XLA apply_q8 path (interpret
mode on CPU; the real-chip timing comparison lives in
scripts/probe_pallas_rb.py and its verdict in BASELINE.md)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vits_tpu.models.modules import ResBlock2
from vits_tpu.nn.packed import mask_packed
from vits_tpu.nn.pallas_rb import resblock2_chain_q8


def _cast(t):
    return jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, t)


@pytest.mark.parametrize("C,pack,ks,dil,B,M", [
    (16, 2, 3, (1, 3), 2, 12),      # packed, 2-iter
    (32, 1, 3, (1, 3, 5), 2, 20),   # unpacked (stage-0/1 form), 3-iter
    (16, 4, 5, (1, 3, 5), 1, 16),   # deep pack, wider kernel
])
def test_pallas_chain_matches_apply_q8(C, pack, ks, dil, B, M):
    rng = np.random.RandomState(0)
    rb = ResBlock2(channels=C, kernel_size=ks, dilation=dil, gin_channels=16)
    p = _cast(rb.init_params(jax.random.PRNGKey(1)))
    L = pack * C
    x = jnp.asarray(rng.randn(B, M, L).astype(np.float32), jnp.bfloat16)
    g = jnp.asarray(rng.randn(B, 16).astype(np.float32), jnp.bfloat16)
    Tfull = M * pack
    lens = [Tfull - 3 * (i % 2) - 1 for i in range(B)]  # partial final pack
    mask = (np.arange(Tfull)[None, :, None]
            < np.asarray(lens)[:, None, None]).astype(np.float32)
    mask = jnp.asarray(mask, jnp.bfloat16)
    x = mask_packed(x, mask, pack)
    rec = {}
    if pack > 1:
        rb.apply_packed(p, x, g, pack, x_mask=mask, record=rec)
    else:
        rb.apply(p, x, g, x_mask=mask, record=rec)
    qp = rb.quantize_params(p, rec, pack, prefix="")
    ref = np.asarray(rb.apply_q8(qp, x, g, pack=pack, x_mask=mask), np.float32)
    out = np.asarray(resblock2_chain_q8(rb, qp, x, g, pack=pack, x_mask=mask,
                                        chunk=8, interpret=True), np.float32)
    assert out.shape == ref.shape
    # identical int8 matmuls; only gate-transcendental rounding differs
    np.testing.assert_allclose(out, ref, atol=0.05 * max(1.0, np.abs(ref).max()))


def test_pallas_chain_uneven_chunk():
    """M not a multiple of the chunk: the wrapper pads and slices back."""
    rng = np.random.RandomState(3)
    rb = ResBlock2(channels=16, kernel_size=3, dilation=(1, 3), gin_channels=8)
    p = _cast(rb.init_params(jax.random.PRNGKey(2)))
    B, M, pack = 2, 13, 2
    x = jnp.asarray(rng.randn(B, M, 32).astype(np.float32), jnp.bfloat16)
    g = jnp.asarray(rng.randn(B, 8).astype(np.float32), jnp.bfloat16)
    rec = {}
    rb.apply_packed(p, x, g, pack, record=rec)
    qp = rb.quantize_params(p, rec, pack, prefix="")
    ref = np.asarray(rb.apply_q8(qp, x, g, pack=pack), np.float32)
    out = np.asarray(resblock2_chain_q8(rb, qp, x, g, pack=pack,
                                        chunk=8, interpret=True), np.float32)
    np.testing.assert_allclose(out, ref, atol=0.05 * max(1.0, np.abs(ref).max()))
