"""Full-size golden parity (VERDICT.md weak #3): our Synthesizer vs the torch
reference at configs/base.json scale.

The TINY-config parity suite (test_model_parity.py) cannot exercise
full-size-only surfaces: long sequences against the 384-entry sinusoidal PE
table (this fork uses plain SDPA — no relative-position attention; see
models/attentions.py:4-5 and reference attentions.py:57-100), the decoder
pack schedule at real channel widths (512->32 over 4 stages), and numerical
drift through the deep stacks (6-layer encoder, 16-layer posterior WN,
4 flows). This runs the
reference SynthesizerTrn (models.py:411-575) random-initialised at the full
base config on CPU, bridges the state_dict, and requires allclose on
infer_p1 + infer_p2 for a realistically long utterance.

Slow (~3-6 min on CPU); marked slow, included in the full suite.
"""
import os
import sys

import numpy as np
import pytest
import torch

import jax.numpy as jnp
import jax

REF = "/root/reference/emotional-vits"
pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not os.path.isdir(REF), reason="reference repo not mounted"),
]

if os.path.isdir(REF) and REF not in sys.path:
    sys.path.insert(0, REF)

from vits_tpu.config import get_hparams_from_file, default_config_path  # noqa: E402
from vits_tpu.models.synthesizer import Synthesizer  # noqa: E402
from vits_tpu.utils.torch_compat import load_torch_state_dict  # noqa: E402
from vits_tpu.ops.seq import infer_path  # noqa: E402


@pytest.fixture(scope="module")
def fullsize():
    import models as ref_models  # reference repo module

    hps = get_hparams_from_file(default_config_path("base"))
    m = hps.model
    torch.manual_seed(7)
    tm = ref_models.SynthesizerTrn(
        hps.data.text_channels,
        hps.data.filter_length // 2 + 1,
        hps.train.segment_size // hps.data.hop_length,
        inter_channels=m.inter_channels, hidden_channels=m.hidden_channels,
        filter_channels=m.filter_channels, n_heads=m.n_heads,
        n_layers=m.n_layers, kernel_size=m.kernel_size, p_dropout=m.p_dropout,
        resblock_kernel_sizes=list(m.resblock_kernel_sizes),
        resblock_dilation_sizes=[list(d) for d in m.resblock_dilation_sizes],
        upsample_rates=list(m.upsample_rates),
        upsample_initial_channel=m.upsample_initial_channel,
        upsample_kernel_sizes=list(m.upsample_kernel_sizes),
        resblock=str(m.resblock), ffn=m.ffn,
        kernel_size_q=m.kernel_size_q, n_layers_q=m.n_layers_q,
        hidden_size_d=m.hidden_size_d, kernel_size_d=m.kernel_size_d,
        p_dropout_d=m.p_dropout_d, act_func_d=m.act_func_d,
        dilation_rate=list(m.dilation_rate), n_flows=m.n_flows,
        n_speakers=hps.data.n_speakers, gin_channels=m.gin_channels,
    ).eval()

    ours = Synthesizer.from_hps(hps)
    params0 = ours.init_params(jax.random.PRNGKey(0))
    params = load_torch_state_dict(tm.state_dict(), params0, strict=False)
    return hps, tm, ours, params


def test_fullsize_infer_parity(fullsize):
    """infer_p1 + infer_p2 allclose at base scale, T_x long enough that the
    sinusoidal-PE + SDPA stack sees realistic sequence lengths."""
    hps, tm, ours, params = fullsize
    T_x = 64
    rng = np.random.RandomState(123)
    x = rng.randn(1, T_x, hps.data.text_channels).astype(np.float32)
    emo = rng.randn(1, 1024).astype(np.float32)
    sid = np.array([1234], dtype=np.int64)

    with torch.no_grad():
        m_p_t, s_p_t, logw_t, g_t = tm.infer_p1(
            torch.from_numpy(x), torch.from_numpy(emo), torch.from_numpy(sid))
    m_p, s_p, logw, g = ours.infer_p1(
        params, jnp.asarray(x), jnp.asarray(emo), jnp.asarray(sid))
    np.testing.assert_allclose(np.asarray(g), g_t.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(m_p).transpose(0, 2, 1), m_p_t.numpy(),
                               atol=5e-4)
    np.testing.assert_allclose(np.asarray(s_p).transpose(0, 2, 1), s_p_t.numpy(),
                               atol=5e-4)
    np.testing.assert_allclose(np.asarray(logw).transpose(0, 2, 1), logw_t.numpy(),
                               atol=5e-4)

    # phase 2 on a short latent (decode at base scale upsamples 192x)
    import commons as ref_commons
    with torch.no_grad():
        w_ceil = torch.clamp(torch.ceil(torch.exp(logw_t)), max=4.0)
        y_length = int(torch.clamp_min(torch.sum(w_ceil), 1).item())
        attn_t = ref_commons.infer_path(w_ceil, T_x, y_length)
        noise_t = torch.from_numpy(
            rng.randn(1, hps.model.inter_channels, y_length).astype(np.float32)
        ) * hps.data.noise_scale
        wav_t = tm.infer_p2(attn_t, m_p_t, s_p_t, g_t, noise_t)

    w_ceil_j = jnp.minimum(jnp.ceil(jnp.exp(logw))[..., 0], 4.0)
    attn = infer_path(w_ceil_j, y_length)
    np.testing.assert_array_equal(np.asarray(attn), attn_t.numpy())
    wav = ours.infer_p2(params, attn, m_p, s_p, g,
                        jnp.asarray(noise_t.numpy().transpose(0, 2, 1)))
    wav_np = np.asarray(wav).transpose(0, 2, 1)
    np.testing.assert_allclose(wav_np, wav_t.numpy(), atol=2e-3)
    corr = np.corrcoef(wav_np.ravel(), wav_t.numpy().ravel())[0, 1]
    assert corr > 0.99999, corr


def test_fullsize_long_sequence_parity(fullsize):
    """T_x=96 (beyond anything the TINY suite runs) still matches torch —
    guards the learned-α sinusoidal PE table lookup and masked SDPA at long
    lengths. (This fork has no relative-position attention: reference
    attentions.py:57-100 is plain SDPA.)"""
    hps, tm, ours, params = fullsize
    T_x = 96
    rng = np.random.RandomState(7)
    x = rng.randn(1, T_x, hps.data.text_channels).astype(np.float32)
    emo = rng.randn(1, 1024).astype(np.float32)
    sid = np.array([7], dtype=np.int64)
    with torch.no_grad():
        m_p_t, _, logw_t, _ = tm.infer_p1(
            torch.from_numpy(x), torch.from_numpy(emo), torch.from_numpy(sid))
    m_p, _, logw, _ = ours.infer_p1(
        params, jnp.asarray(x), jnp.asarray(emo), jnp.asarray(sid))
    np.testing.assert_allclose(np.asarray(m_p).transpose(0, 2, 1), m_p_t.numpy(),
                               atol=5e-4)
    np.testing.assert_allclose(np.asarray(logw).transpose(0, 2, 1), logw_t.numpy(),
                               atol=5e-4)
