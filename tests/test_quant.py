"""int8 quantized decode path (nn/quant.py): kernel quantization round-trip,
ResBlock2 int8 vs float agreement, and the full quantized Generator decode
staying close to the float decode (masked-padded included)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vits_tpu.nn import quant as Q
from vits_tpu.nn.packed import pack, unpack


def corr(a, b):
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    return float(np.corrcoef(a, b)[0, 1])


def test_quantize_kernel_roundtrip():
    w = np.random.RandomState(0).randn(7, 16, 24).astype(np.float32)
    w8, s = Q.quantize_kernel(jnp.asarray(w))
    assert w8.dtype == jnp.int8 and s.shape == (24,)
    back = np.asarray(w8, np.float32) * np.asarray(s)
    np.testing.assert_allclose(back, w, atol=float(np.abs(w).max()) / 127 * 0.51)


def test_quantize_act_range():
    x = jnp.asarray([[-3.0, -1.5, 0.0, 0.7, 3.0]])
    s = Q.act_scale(3.0)
    x8 = Q.quantize_act(x, s)
    assert x8.dtype == jnp.int8
    np.testing.assert_array_equal(np.asarray(x8), [[-127, -64, 0, 30, 127]])


@pytest.mark.parametrize("k,d,p", [(3, 1, 1), (7, 3, 1), (11, 5, 4), (3, 1, 4), (7, 5, 2)])
def test_conv1d_q8_matches_float(k, d, p):
    from vits_tpu.nn.core import Conv1d
    c_in, c_out, T = 16, 16, 8 * max(p, 4)
    layer = Conv1d(c_in, c_out, k, padding=d * (k - 1) // 2, dilation=d)
    params = layer.init_params(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, T, c_in))
    ref = layer.apply(params, x)

    w8, s_w, fmin, fmax, rd = Q.pack_quantize_kernel(params["w"], k, p, d,
                                                     d * (k - 1) // 2)
    s_in = Q.act_scale(jnp.max(jnp.abs(x)))
    xq = pack(x, p) if p > 1 else x
    y = Q.conv1d_q8(Q.quantize_act(xq, s_in), w8, fmin, fmax, s_in,
                    s_w, Q.tile_bias(params["b"], p), out_dtype=jnp.float32,
                    rhs_dilation=rd)
    got = unpack(y, p) if p > 1 else y
    assert got.shape == ref.shape
    assert corr(got, ref) > 0.999


@pytest.mark.parametrize("ch,p", [(32, 4), (64, 2), (256, 1)])
def test_resblock2_q8_close_to_float(ch, p):
    from vits_tpu.models.modules import ResBlock2
    rb = ResBlock2(ch, 7, (1, 3, 5), gin_channels=24)
    params = rb.init_params(jax.random.PRNGKey(4))
    T = 16 * max(p, 2)
    x = jax.random.normal(jax.random.PRNGKey(5), (2, T, ch))
    g = jax.random.normal(jax.random.PRNGKey(6), (2, 24))

    record = {}
    xp = pack(x, p) if p > 1 else x
    if p > 1:
        ref = rb.apply_packed(params, xp, g, p, record=record, rec_prefix="t_")
    else:
        ref = rb.apply(params, x, g, record=record, rec_prefix="t_")
    qp = rb.quantize_params(params, record, p, prefix="t_")
    got = rb.apply_q8(qp, xp, g, pack=p)
    assert got.shape == ref.shape
    assert corr(got, ref) > 0.999


def _tiny_gen():
    from vits_tpu.models.synthesizer import Generator
    return Generator(
        initial_channel=12, resblock="2",
        resblock_kernel_sizes=(3, 7, 11),
        resblock_dilation_sizes=((1, 3, 5), (1, 3, 5), (1, 3, 5)),
        upsample_rates=(8, 6, 2, 2), upsample_initial_channel=256,
        upsample_kernel_sizes=(16, 12, 4, 4), gin_channels=24)


def test_generator_q8_decode_close_and_mask_consistent():
    gen = _tiny_gen()
    params = gen.init_params(jax.random.PRNGKey(7))
    B, T = 2, 12
    z = jax.random.normal(jax.random.PRNGKey(8), (B, T, 12))
    g = jax.random.normal(jax.random.PRNGKey(9), (B, 24))

    ref = gen.apply(params, z, g=g)
    scales = gen.calibrate(params, z, g=g)
    qp = gen.quantize(params, scales)
    got = jax.jit(lambda qp, z, g: gen.apply(qp, z, g=g, q8=True))(qp, z, g)
    assert got.shape == ref.shape == (B, T * 192, 1)
    assert corr(got, ref) > 0.99
    # int8 error stays small in absolute terms on the (-1,1) waveform
    assert float(jnp.max(jnp.abs(got - ref))) < 0.15

    # masked-padded q8 decode == exact-length q8 decode
    keep = 9
    mask = jnp.concatenate([jnp.ones((B, keep, 1)), jnp.zeros((B, T - keep, 1))], axis=1)
    padded = gen.apply(qp, z * mask, g=g, x_mask=mask, q8=True)
    exact = gen.apply(qp, z[:, :keep], g=g, q8=True)
    np.testing.assert_allclose(np.asarray(padded[:, :keep * 192]),
                               np.asarray(exact), atol=2e-2)


def test_infer_p2_q8_wiring():
    from vits_tpu.models.synthesizer import Synthesizer
    synth = Synthesizer(
        text_channels=16, spec_channels=33, segment_size=8, inter_channels=12,
        hidden_channels=16, filter_channels=32, n_heads=2, n_layers=1,
        kernel_size=3, p_dropout=0.0,
        resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3),),
        upsample_rates=(4, 2), upsample_initial_channel=64,
        upsample_kernel_sizes=(8, 4), resblock="2",
        n_layers_q=2, n_flows=1, n_speakers=4, gin_channels=8)
    p = synth.init_params(jax.random.PRNGKey(0))
    B, Tx, Ty = 2, 6, 12
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, Tx, 16), jnp.float32)
    emo = jnp.asarray(rng.randn(B, 1024), jnp.float32)
    sid = jnp.asarray([0, 1], jnp.int32)
    noise = jnp.asarray(rng.randn(B, Ty, 12), jnp.float32)
    from vits_tpu.ops.seq import infer_path
    attn = infer_path(jnp.full((B, Tx), Ty // Tx, jnp.float32), Ty)

    m_p, s_p, logw, g = synth.infer_p1(p, x, emo, sid)
    ref = synth.infer_p2(p, attn, m_p, s_p, g, noise)

    z_cal = jnp.einsum("byx,bxc->byc", attn, m_p) + noise * jnp.einsum(
        "byx,bxc->byc", attn, s_p)
    z_cal = synth.flow.apply(p["flow"], z_cal, None, g=g, reverse=True)
    dec_q8 = synth.quantize_decoder(p, z_cal, g)
    got = synth.infer_p2(p, attn, m_p, s_p, g, noise, dec_q8=dec_q8)
    assert got.shape == ref.shape
    assert corr(got, ref) > 0.99


def test_generator_q8_covers_all_conv_macs():
    """The int8 path must cover conv_pre, every upsample transposed conv, and
    conv_post — not just the resblocks (VERDICT.md weak #4: the upsample
    stages are the largest MAC blocks). Guards against regressing to a
    resblock-only quantization."""
    gen = _tiny_gen()
    params = gen.init_params(jax.random.PRNGKey(7))
    z = jax.random.normal(jax.random.PRNGKey(8), (1, 8, 12))
    g = jax.random.normal(jax.random.PRNGKey(9), (1, 24))
    scales = gen.calibrate(params, z, g=g)
    for k in ("pre_in", "post_in"):
        assert k in scales
    for i in range(gen.num_upsamples):
        assert f"up{i}_in" in scales
    qp = gen.quantize(params, scales)
    assert qp["pre_q8"]["w8"].dtype == jnp.int8
    assert qp["post_q8"]["w8"].dtype == jnp.int8
    assert set(qp["ups_q8"]) == {str(i) for i in range(gen.num_upsamples)}
    for i in range(gen.num_upsamples):
        q = qp["ups_q8"][str(i)]
        assert q["w8"].dtype == jnp.int8
        # packed dense transposed kernel: output features = p_in*stride*C_out
        assert q["w8"].shape[-1] == q["s_w"].shape[-1] == q["b"].shape[-1]
