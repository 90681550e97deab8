"""Quantized serving mode: EmoVITS(quantize=True) produces waveforms close to
the float engine, with lazy first-request calibration."""

import json
import os

import numpy as np
import pytest

import jax

from vits_tpu.models.synthesizer import Synthesizer
from vits_tpu.utils import checkpoint as ckpt

from tests.test_infer_wrap import TINY_JSON


@pytest.fixture(scope="module")
def deploy_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("deploy_q8")
    with open(d / "config.json", "w") as f:
        json.dump(TINY_JSON, f)
    from vits_tpu.config import get_hparams_from_file
    hps = get_hparams_from_file(str(d / "config.json"))
    synth = Synthesizer.from_hps(hps)
    params = synth.init_params(jax.random.PRNGKey(7))
    ckpt.save_checkpoint(str(d / "checkpoint.npz"), {"model": jax.device_get(params)})
    return str(d)


def test_emovits_quantized_close_to_float(deploy_dir, monkeypatch):
    from vits_tpu.infer import EmoVITS
    monkeypatch.setenv("VITS_TPU_Q8_CALIB_REQUESTS", "2")
    ref_model = EmoVITS(os.path.join(deploy_dir, "checkpoint.npz"))
    q_model = EmoVITS(os.path.join(deploy_dir, "checkpoint.npz"), quantize=True)
    assert q_model.dec_q8 is None  # lazy: calibrated over the first N requests

    rng = np.random.RandomState(0)
    text = rng.randn(19, 16).astype(np.float32)
    emo = np.zeros(1024, np.float32)
    np.random.seed(0)  # both engines draw the same noise-ring slice
    wav_ref, _ = ref_model._infer_two_phase(1, text, emo)
    # request 1 only observes statistics and serves the float path exactly
    # (calibration needs the two-phase p1 artifacts, so quantize serving
    # stays two-phase until the scales freeze)
    np.random.seed(0)
    wav1, _ = q_model.infer(1, text, emo)
    assert q_model.dec_q8 is None and q_model._q8_seen == 1
    np.testing.assert_allclose(wav1, wav_ref, atol=1e-6)
    # request 2 freezes the scales (running max-abs), passes the corr gate,
    # and serves quantized
    np.random.seed(0)
    wav_q, _ = q_model.infer(1, text, emo)
    assert q_model.dec_q8 is not None
    assert wav_q.shape == wav_ref.shape
    c = float(np.corrcoef(wav_ref, wav_q)[0, 1])
    assert c > 0.98, c

    # with dec_q8 frozen, subsequent requests dispatch the fused graph with
    # the bf16 decoder: at batch-1 shapes fused+int8 measured within relay
    # noise of fused bf16 (BASELINE.md batch-1 table, VERDICT r4 task 4),
    # so the default fused decode stays float (waveform parity for free)
    text2 = rng.randn(7, 16).astype(np.float32)
    wav2, _ = q_model.infer(1, text2, emo)
    assert np.all(np.isfinite(wav2))
    assert q_model._fused_cache and not any(k[2] for k in q_model._fused_cache), \
        "default fused graph must decode bf16 (int8 measured slower at batch 1)"
    # VITS_TPU_FUSED_Q8=1 opts the fused graph into the int8 decoder
    os.environ["VITS_TPU_FUSED_Q8"] = "1"
    try:
        wav3, _ = q_model.infer(1, text2, emo)
        assert np.all(np.isfinite(wav3))
        assert any(k[2] for k in q_model._fused_cache), \
            "VITS_TPU_FUSED_Q8=1 must dispatch the fused int8 graph"
    finally:
        del os.environ["VITS_TPU_FUSED_Q8"]


def test_emovits_q8_gate_falls_back_to_float(deploy_dir, monkeypatch):
    """An unreachable correlation threshold must disable the int8 path and
    keep serving floats rather than degrade quality silently."""
    from vits_tpu.infer import EmoVITS
    monkeypatch.setenv("VITS_TPU_Q8_CALIB_REQUESTS", "1")
    monkeypatch.setenv("VITS_TPU_Q8_MIN_CORR", "1.1")
    q_model = EmoVITS(os.path.join(deploy_dir, "checkpoint.npz"), quantize=True)
    rng = np.random.RandomState(3)
    text = rng.randn(11, 16).astype(np.float32)
    emo = np.zeros(1024, np.float32)
    wav, _ = q_model.infer(1, text, emo)
    assert q_model.dec_q8 is None and not q_model.quantize
    assert np.all(np.isfinite(wav))


def test_emovits_quantize_env_flag(deploy_dir, monkeypatch):
    from vits_tpu.infer import EmoVITS
    monkeypatch.setenv("VITS_TPU_QUANTIZE", "1")
    model = EmoVITS(os.path.join(deploy_dir, "checkpoint.npz"))
    assert model.quantize
    monkeypatch.setenv("VITS_TPU_QUANTIZE", "0")
    model = EmoVITS(os.path.join(deploy_dir, "checkpoint.npz"))
    assert not model.quantize
