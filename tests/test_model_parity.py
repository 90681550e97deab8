"""Golden parity: our Synthesizer vs the reference torch SynthesizerTrn.

The reference repo (read-only at /root/reference) is imported as an oracle: we
random-init its torch model, bridge the state_dict into our pytree via
vits_tpu.utils.torch_compat, and require allclose on the deterministic
inference graphs (infer_p1 + infer_p2 cover enc_p, dp, flow-reverse, dec;
posterior stats cover enc_q). No reference code is copied.
"""
import os
import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

REF = "/root/reference/emotional-vits"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="reference repo not mounted")

if os.path.isdir(REF) and REF not in sys.path:
    sys.path.insert(0, REF)

from vits_tpu.models.synthesizer import Synthesizer  # noqa: E402
from vits_tpu.utils.torch_compat import load_torch_state_dict  # noqa: E402
from vits_tpu.ops.seq import infer_path, sequence_mask  # noqa: E402

TINY = dict(
    text_channels=8,
    spec_channels=33,
    segment_size=8,
    inter_channels=8,
    hidden_channels=16,
    filter_channels=24,
    n_heads=2,
    n_layers=2,
    kernel_size=3,
    p_dropout=0.1,
    resblock_kernel_sizes=(3,),
    resblock_dilation_sizes=((1, 3),),
    upsample_rates=(4, 2),
    upsample_initial_channel=64,
    upsample_kernel_sizes=(8, 4),
    resblock="2",
    ffn="FFN2",
    kernel_size_q=5,
    n_layers_q=3,
    hidden_size_d=16,
    kernel_size_d=5,
    p_dropout_d=0.5,
    act_func_d="ReLU",
    dilation_rate=(1, 1),
    n_flows=2,
    n_speakers=4,
    gin_channels=16,
)


@pytest.fixture(scope="module")
def models():
    import models as ref_models  # reference repo module

    torch.manual_seed(0)
    tm = ref_models.SynthesizerTrn(
        TINY["text_channels"], TINY["spec_channels"], TINY["segment_size"],
        inter_channels=TINY["inter_channels"], hidden_channels=TINY["hidden_channels"],
        filter_channels=TINY["filter_channels"], n_heads=TINY["n_heads"],
        n_layers=TINY["n_layers"], kernel_size=TINY["kernel_size"],
        p_dropout=TINY["p_dropout"],
        resblock_kernel_sizes=list(TINY["resblock_kernel_sizes"]),
        resblock_dilation_sizes=[list(d) for d in TINY["resblock_dilation_sizes"]],
        upsample_rates=list(TINY["upsample_rates"]),
        upsample_initial_channel=TINY["upsample_initial_channel"],
        upsample_kernel_sizes=list(TINY["upsample_kernel_sizes"]),
        resblock=TINY["resblock"], ffn=TINY["ffn"],
        kernel_size_q=TINY["kernel_size_q"], n_layers_q=TINY["n_layers_q"],
        hidden_size_d=TINY["hidden_size_d"], kernel_size_d=TINY["kernel_size_d"],
        p_dropout_d=TINY["p_dropout_d"], act_func_d=TINY["act_func_d"],
        dilation_rate=list(TINY["dilation_rate"]), n_flows=TINY["n_flows"],
        n_speakers=TINY["n_speakers"], gin_channels=TINY["gin_channels"],
    ).eval()

    ours = Synthesizer(**TINY)
    params0 = ours.init_params(jax.random.PRNGKey(0))
    params = load_torch_state_dict(tm.state_dict(), params0, strict=False, verbose=True)
    return tm, ours, params


def _inputs(T_x=11):
    rng = np.random.RandomState(42)
    x = rng.randn(1, T_x, TINY["text_channels"]).astype(np.float32)
    emo = rng.randn(1, 1024).astype(np.float32)
    sid = np.array([2], dtype=np.int64)
    return x, emo, sid


def test_bridge_covers_all_torch_keys(models):
    tm, ours, params = models
    from vits_tpu.utils.torch_compat import _to_numpy, _resolve_leaf_name
    missing = []
    for key in tm.state_dict():
        node = params
        ok = True
        for seg in key.split(".")[:-1]:
            if seg not in node:
                ok = False
                break
            node = node[seg]
        if ok:
            ok = _resolve_leaf_name(node, key.split(".")[-1]) in node
        if not ok:
            missing.append(key)
    assert not missing, f"unbridged torch keys: {missing}"


def test_infer_p1_parity(models):
    tm, ours, params = models
    x, emo, sid = _inputs()
    with torch.no_grad():
        m_p_t, s_p_t, logw_t, g_t = tm.infer_p1(
            torch.from_numpy(x), torch.from_numpy(emo), torch.from_numpy(sid))
    m_p, s_p, logw, g = ours.infer_p1(params, jnp.asarray(x), jnp.asarray(emo), jnp.asarray(sid))
    np.testing.assert_allclose(np.asarray(g), g_t.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(m_p).transpose(0, 2, 1), m_p_t.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(s_p).transpose(0, 2, 1), s_p_t.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(logw).transpose(0, 2, 1), logw_t.numpy(), atol=1e-4)


def test_infer_p2_end_to_end_parity(models):
    import commons as ref_commons

    tm, ours, params = models
    x, emo, sid = _inputs()
    with torch.no_grad():
        m_p_t, s_p_t, logw_t, g_t = tm.infer_p1(
            torch.from_numpy(x), torch.from_numpy(emo), torch.from_numpy(sid))
        w_ceil = torch.ceil(torch.exp(logw_t))
        y_length = int(torch.clamp_min(torch.sum(w_ceil), 1).item())
        attn_t = ref_commons.infer_path(w_ceil, x.shape[1], y_length)
        noise = torch.from_numpy(
            np.random.RandomState(1).randn(1, TINY["inter_channels"], y_length).astype(np.float32)) * 0.5
        wav_t = tm.infer_p2(attn_t, m_p_t, s_p_t, g_t, noise)

    m_p, s_p, logw, g = ours.infer_p1(params, jnp.asarray(x), jnp.asarray(emo), jnp.asarray(sid))
    w_ceil_j = jnp.ceil(jnp.exp(logw))[..., 0]
    attn = infer_path(w_ceil_j, y_length)
    np.testing.assert_allclose(np.asarray(attn).transpose(0, 2, 1).sum(), attn_t.numpy().sum())
    np.testing.assert_array_equal(np.asarray(attn), attn_t.numpy().transpose(0, 2, 1) if attn_t.shape[1] == x.shape[1] else attn_t.numpy())
    wav = ours.infer_p2(params, attn, m_p, s_p, g,
                        jnp.asarray(noise.numpy().transpose(0, 2, 1)))
    np.testing.assert_allclose(np.asarray(wav).transpose(0, 2, 1), wav_t.numpy(), atol=2e-4)


def test_posterior_stats_parity(models):
    tm, ours, params = models
    rng = np.random.RandomState(5)
    T_y = 17
    spec = rng.randn(1, TINY["spec_channels"], T_y).astype(np.float32)
    with torch.no_grad():
        # reference forward computes stats then samples; grab stats via proj path
        tspec = torch.from_numpy(spec)
        x_mask = torch.ones(1, 1, T_y)
        h = tm.enc_q.pre(tspec) * x_mask
        h = tm.enc_q.enc(h, x_mask, g=None)
        stats = tm.enc_q.proj(h) * x_mask
        m_t, logs_t = torch.split(stats, TINY["inter_channels"], dim=1)
    ymask = jnp.ones((1, T_y, 1))
    m, logs = ours.enc_q.stats(params["enc_q"], jnp.asarray(spec.transpose(0, 2, 1)), ymask)
    np.testing.assert_allclose(np.asarray(m).transpose(0, 2, 1), m_t.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(logs).transpose(0, 2, 1), logs_t.numpy(), atol=1e-4)


def test_masked_padded_equals_exact(models):
    """Padding + masks must reproduce the exact-length dense computation —
    the design premise replacing the reference's mask-free infer() paths."""
    tm, ours, params = models
    x, emo, sid = _inputs(T_x=11)
    m_p, s_p, logw, g = ours.infer_p1(params, jnp.asarray(x), jnp.asarray(emo), jnp.asarray(sid))

    T_pad = 16
    x_pad = np.zeros((1, T_pad, TINY["text_channels"]), np.float32)
    x_pad[:, :11] = x
    x_mask = sequence_mask(jnp.array([11]), T_pad)[..., None].astype(jnp.float32)
    m_p2, s_p2, logw2, _ = ours.infer_p1(params, jnp.asarray(x_pad), jnp.asarray(emo),
                                         jnp.asarray(sid), x_mask=x_mask)
    np.testing.assert_allclose(np.asarray(m_p2)[:, :11], np.asarray(m_p), atol=1e-5)
    np.testing.assert_allclose(np.asarray(logw2)[:, :11], np.asarray(logw), atol=1e-5)

    # decoder: padded+masked == exact
    y_len = 13
    rngz = np.random.RandomState(2)
    z = rngz.randn(1, y_len, TINY["inter_channels"]).astype(np.float32)
    wav_exact = ours.dec.apply(params["dec"], jnp.asarray(z), g=g)
    z_pad = np.zeros((1, 20, TINY["inter_channels"]), np.float32)
    z_pad[:, :y_len] = z
    y_mask = sequence_mask(jnp.array([y_len]), 20)[..., None].astype(jnp.float32)
    wav_pad = ours.dec.apply(params["dec"], jnp.asarray(z_pad), g=g, x_mask=y_mask)
    up = int(np.prod(TINY["upsample_rates"]))
    np.testing.assert_allclose(np.asarray(wav_pad)[:, :y_len * up],
                               np.asarray(wav_exact), atol=1e-5)
