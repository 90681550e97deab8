"""Phase-packed conv path (nn/packed.py): exact equivalence with the
unpacked layers, and the packed Generator decode == unpacked decode."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vits_tpu.nn import core as nnc
from vits_tpu.nn.packed import (
    conv1d_packed,
    conv_transpose1d_packed,
    mask_packed,
    pack,
    repack,
    unpack,
)


@pytest.mark.parametrize("k,d,p", [(3, 1, 4), (3, 3, 4), (7, 5, 4), (11, 5, 4),
                                   (3, 1, 2), (11, 3, 2), (7, 1, 8), (5, 2, 4)])
def test_conv1d_packed_matches_unpacked(k, d, p):
    c_in, c_out, T = 32, 24, 48
    layer = nnc.Conv1d(c_in, c_out, k, padding=d * (k - 1) // 2, dilation=d)
    key = jax.random.PRNGKey(0)
    params = layer.init_params(key)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, T, c_in))
    ref = layer.apply(params, x)
    got = unpack(conv1d_packed(layer, params, pack(x, p), p), p)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("u,p_in", [(8, 1), (6, 1), (2, 1), (2, 2), (2, 4), (6, 2)])
def test_conv_transpose1d_packed_matches_unpacked(u, p_in):
    k = 2 * u  # decoder convention: k == 2*pad + u with pad = (k-u)//2
    c_in, c_out, T = 16, 12, 24
    layer = nnc.ConvTranspose1d(c_in, c_out, k, u, padding=(k - u) // 2,
                                weight_norm=True)
    params = layer.init_params(jax.random.PRNGKey(2))
    x = jax.random.normal(jax.random.PRNGKey(3), (2, T, c_in))
    ref = layer.apply(params, x)
    got = unpack(conv_transpose1d_packed(layer, params, pack(x, p_in), p_in),
                 p_in * u)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_repack_roundtrip():
    x = jnp.arange(2 * 24 * 8, dtype=jnp.float32).reshape(2, 24, 8)
    xp = pack(x, 4)               # (2, 6, 32)
    np.testing.assert_array_equal(np.asarray(unpack(xp, 4)), np.asarray(x))
    x2 = repack(xp, 4, 2)         # (2, 12, 16)
    np.testing.assert_array_equal(np.asarray(unpack(x2, 2)), np.asarray(x))


@pytest.mark.parametrize("cls_name,ch", [("ResBlock2", 32), ("ResBlock2", 64),
                                         ("ResBlock1", 32)])
def test_resblock_packed_matches_unpacked(cls_name, ch):
    from vits_tpu.models import modules
    cls = getattr(modules, cls_name)
    rb = cls(ch, 7, (1, 3, 5), gin_channels=24)
    params = rb.init_params(jax.random.PRNGKey(4))
    p = 128 // ch
    T = 8 * p
    x = jax.random.normal(jax.random.PRNGKey(5), (2, T, ch))
    g = jax.random.normal(jax.random.PRNGKey(6), (2, 24))
    mask = jnp.concatenate([jnp.ones((2, T - p, 1)), jnp.zeros((2, p, 1))], axis=1)
    for m in (None, mask):
        ref = rb.apply(params, x if m is None else x * m, g, x_mask=m)
        got = rb.apply_packed(params, pack(x if m is None else x * m, p), g, p, x_mask=m)
        np.testing.assert_allclose(np.asarray(unpack(got, p)), np.asarray(ref),
                                   atol=2e-5)


def test_generator_packed_matches_unpacked():
    from vits_tpu.models.synthesizer import Generator
    gen = Generator(
        initial_channel=12, resblock="2",
        resblock_kernel_sizes=(3, 7, 11),
        resblock_dilation_sizes=((1, 3, 5), (1, 3, 5), (1, 3, 5)),
        upsample_rates=(8, 6, 2, 2), upsample_initial_channel=256,
        upsample_kernel_sizes=(16, 12, 4, 4), gin_channels=24)
    assert gen._pack_schedule() == (1, 2, 4, 8)
    params = gen.init_params(jax.random.PRNGKey(7))
    B, T = 2, 12
    z = jax.random.normal(jax.random.PRNGKey(8), (B, T, 12))
    g = jax.random.normal(jax.random.PRNGKey(9), (B, 24))
    mask = jnp.concatenate([jnp.ones((B, T - 3, 1)), jnp.zeros((B, 3, 1))], axis=1)
    for m in (None, mask):
        ref = gen.apply(params, z, g=g, x_mask=m, packed=False)
        got = gen.apply(params, z, g=g, x_mask=m, packed=True)
        assert got.shape == ref.shape == (B, T * 192, 1)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_mask_packed_matches_unpacked():
    x = jax.random.normal(jax.random.PRNGKey(10), (2, 24, 8))
    m = jnp.concatenate([jnp.ones((2, 20, 1)), jnp.zeros((2, 4, 1))], axis=1)
    got = unpack(mask_packed(pack(x, 4), m, 4), 4)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(x * m))


def test_dilated_valid_conv_phased_matches_dense():
    """MRD's phase-decomposed dilated VALID conv == the direct dilated conv,
    for every dilation the WaveDiscriminator stack uses and ragged lengths."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from vits_tpu.nn.core import Conv1d
    from vits_tpu.models.mrd import dilated_valid_conv_phased

    rng = np.random.RandomState(0)
    for d in (2, 3, 5, 9):
        for T in (257, 300, 9216 // 16):
            conv = Conv1d(6, 8, 5, padding="VALID", dilation=d, spectral_norm=True)
            p = conv.init_params(jax.random.PRNGKey(d))
            x = jnp.asarray(rng.randn(2, T, 6).astype(np.float32))
            want = conv.apply(p, x)
            got = dilated_valid_conv_phased(conv, p, x)
            assert got.shape == want.shape, (d, T, got.shape, want.shape)
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       atol=2e-5, rtol=1e-5)
