"""Inference engine + export + product wrapper tests (tiny model, CPU)."""
import json
import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vits_tpu.models.synthesizer import Synthesizer
from vits_tpu.utils import checkpoint as ckpt
from vits_tpu.nn.core import fold_weight_norm

TINY_JSON = {
    "train": {"segment_size": 64, "learning_rate": 2e-4, "betas": [0.8, 0.99],
              "eps": 1e-9, "batch_size": 2, "lr_decay": 0.999875, "seed": 1,
              "epochs": 1, "steps": 10, "weight_decay": 0.01,
              "c_mel": 45, "c_dur": 2, "c_kl": 1.0, "c_kl_q": 0.01,
              "log_interval": 1, "eval_interval": 2},
    "data": {"text_channels": 16, "sampling_rate": 1600, "filter_length": 64,
             "hop_length": 8, "win_length": 64, "n_mel_channels": 20,
             "mel_fmin": 0.0, "mel_fmax": None, "n_speakers": 8,
             "noise_scale": 0.707, "max_text_len": 384,
             "training_files": "x", "validation_files": "x"},
    "model": {"inter_channels": 8, "hidden_channels": 16, "filter_channels": 24,
              "n_heads": 2, "n_layers": 2, "kernel_size": 3, "p_dropout": 0.1,
              "ffn": "FFN2", "resblock": "2", "resblock_kernel_sizes": [3],
              "resblock_dilation_sizes": [[1, 3]], "upsample_rates": [4, 2],
              "upsample_initial_channel": 64, "upsample_kernel_sizes": [8, 4],
              "kernel_size_q": 5, "n_layers_q": 3, "hidden_size_d": 16,
              "kernel_size_d": 5, "p_dropout_d": 0.5, "act_func_d": "ReLU",
              "use_spectral_norm": False, "dilation_rate": [1, 1],
              "n_flows": 2, "gin_channels": 16},
}


@pytest.fixture(scope="module")
def deploy_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("deploy")
    with open(d / "config.json", "w") as f:
        json.dump(TINY_JSON, f)
    from vits_tpu.config import get_hparams_from_file
    hps = get_hparams_from_file(str(d / "config.json"))
    synth = Synthesizer.from_hps(hps)
    params = synth.init_params(jax.random.PRNGKey(7))
    ckpt.save_checkpoint(str(d / "checkpoint.npz"), {"model": jax.device_get(params)})
    # speaker map: external id 10000 -> internal 3
    with open(d / "spk.map", "w") as f:
        f.write("# map\n10000 3\n")
    # emotion bank for speaker 3: 2 centroids
    np.random.RandomState(5).randn(2, 1024).astype(np.float32).tofile(str(d / "3.emo"))
    return str(d), synth, params


def test_emovits_infer(deploy_dir):
    d, synth, params = deploy_dir
    from vits_tpu.infer import EmoVITS
    model = EmoVITS(os.path.join(d, "checkpoint.npz"))
    rng = np.random.RandomState(0)
    text = rng.randn(19, 16).astype(np.float32)
    wav, emo_used = model.infer(10000, text, None)  # remapped to 3, bank lookup
    assert wav.ndim == 1 and len(wav) % model.hop_size == 0
    assert np.all(np.isfinite(wav)) and np.abs(wav).max() <= 1.0
    assert emo_used.shape == (1024,)
    # explicit emotion array
    wav2, _ = model.infer(1, text, np.zeros(1024, np.float32), duration_rate=1.5)
    assert len(wav2) > 0
    # duration_rate stretches output
    np.random.seed(0)
    wa, _ = model.infer(1, text, np.zeros(1024, np.float32), duration_rate=0.8)
    np.random.seed(0)
    wb, _ = model.infer(1, text, np.zeros(1024, np.float32), duration_rate=1.6)
    assert len(wb) > len(wa)


def test_emovits_matches_exact_length_graph(deploy_dir):
    """Bucketed masked inference == exact-length dense computation."""
    d, synth, params = deploy_dir
    from vits_tpu.infer import EmoVITS
    from vits_tpu.ops.seq import infer_path
    model = EmoVITS(os.path.join(d, "checkpoint.npz"))
    rng = np.random.RandomState(3)
    text = rng.randn(13, 16).astype(np.float32)
    emo = rng.randn(1024).astype(np.float32)
    np.random.seed(42)
    wav, _ = model._infer_two_phase(2, text, emo)

    # exact-length reference using the same folded params + same noise
    p = model.params
    x = jnp.asarray(text[None])
    m_p, s_p, logw, g = synth.infer_p1(p, x, jnp.asarray(emo[None]), jnp.asarray([2], jnp.int32))
    w_ceil = np.ceil(np.exp(np.asarray(logw))[0, :, 0])
    y_len = int(w_ceil.sum())
    assert len(wav) == y_len * 8
    attn = infer_path(jnp.asarray(w_ceil[None]), y_len)
    np.random.seed(42)
    # replicate the engine's noise slice for y_pad, then trim
    y_pad = ((y_len + 63) // 64) * 64
    nl = y_pad * 8
    start = np.random.randint(max(model.noise.size - nl, 1))
    noise_full = np.resize(model.noise[start:start + nl], (nl,)).reshape(1, y_pad, 8)
    wav_ref = synth.infer_p2(p, attn, m_p, s_p, g, jnp.asarray(noise_full[:, :y_len]))
    np.testing.assert_allclose(wav, np.asarray(wav_ref)[0, :, 0], atol=2e-5)


def test_emovits_hot_reload(deploy_dir):
    d, synth, params = deploy_dir
    from vits_tpu.infer import EmoVITS
    model = EmoVITS(os.path.join(d, "checkpoint.npz"))
    assert model.spkid_mapping[10000] == 3
    mp = os.path.join(d, "spk.map")
    with open(mp, "w") as f:
        f.write("10000 5\n")
    os.utime(mp, (0, 2_000_000_000))
    model.update()
    assert model.spkid_mapping[10000] == 5


def test_export_cli(deploy_dir, tmp_path):
    d, synth, params = deploy_dir
    import vits_tpu.export as export_mod
    run_dir = tmp_path / "run"
    run_dir.mkdir()
    import shutil
    shutil.copy(os.path.join(d, "config.json"), run_dir / "config.json")
    for step in (10, 20, 30):
        scaled = jax.tree_util.tree_map(lambda a: a * (step / 20.0), params)
        ckpt.save_checkpoint(str(run_dir / f"G_{step}.npz"),
                             {"model": jax.device_get(scaled)}, step=step)
    out = tmp_path / "out"
    export_mod.main(["--outdir", str(out), "--checkpoint", str(run_dir),
                     "--greedy", "3", "--verbose", "0"])
    assert (out / "checkpoint.npz").exists() and (out / "config.json").exists()
    loaded, _, _ = ckpt.load_checkpoint(str(out / "checkpoint.npz"),
                                        {"model": jax.device_get(params)})
    # soup of scales 0.5, 1.0, 1.5 -> 1.0x
    a = np.asarray(loaded["model"]["emb_g"]["embedding"])
    b = np.asarray(params["emb_g"]["embedding"])
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_infer_stream_matches_infer(deploy_dir):
    """Chunked streaming synthesis == one-shot two-phase synthesis, sample
    for sample (north-star config 5). frame_quantum=16 keeps y_pad (and thus
    the seeded noise-ring slice) identical between the two paths while
    forcing several decode windows."""
    d, synth, params = deploy_dir
    from vits_tpu.infer import EmoVITS
    model = EmoVITS(os.path.join(d, "checkpoint.npz"), frame_quantum=16)
    rng = np.random.RandomState(11)
    text = rng.randn(37, 16).astype(np.float32)
    emo = rng.randn(1024).astype(np.float32)
    np.random.seed(99)
    wav, _ = model._infer_two_phase(2, text, emo)
    np.random.seed(99)
    chunks = list(model.infer_stream(2, text, emo))
    assert len(chunks) > 2, "expected several decode windows"
    streamed = np.concatenate(chunks)
    assert streamed.shape == wav.shape
    np.testing.assert_allclose(streamed, wav, atol=1e-5)


def test_infer_fused_single_dispatch(deploy_dir):
    """The fused batch-1 latency path (one jitted graph: encode + on-device
    alignment + flow + decode) produces a finite waveform whose length tracks
    the two-phase path's for the same request, and falls back to the exact
    two-phase path when the frame budget would clip."""
    d, synth, params = deploy_dir
    from vits_tpu.infer import EmoVITS
    model = EmoVITS(os.path.join(d, "checkpoint.npz"))
    rng = np.random.RandomState(21)
    text = rng.randn(23, 16).astype(np.float32)
    emo = rng.randn(1024).astype(np.float32)
    wav2p, _ = model._infer_two_phase(2, text, emo)
    wavf, emo_used = model.infer_fused(2, text, emo)
    assert np.all(np.isfinite(wavf)) and len(wavf) % model.hop_size == 0
    # same durations drive both paths: lengths match exactly
    assert len(wavf) == len(wav2p), (len(wavf), len(wav2p))
    assert emo_used.shape == (1024,)
    # duration_rate scales the fused output too
    wslow, _ = model.infer_fused(2, text, emo, duration_rate=1.6)
    assert len(wslow) > len(wavf)
    # force an overflowing frame budget -> transparent 2-phase fallback
    os.environ["VITS_TPU_FUSED_FRAMES_PER_TOKEN"] = "0.1"
    try:
        wfb, _ = model.infer_fused(2, text, emo)
        assert len(wfb) == len(wav2p)
    finally:
        del os.environ["VITS_TPU_FUSED_FRAMES_PER_TOKEN"]


def test_infer_dispatches_to_fused(deploy_dir, monkeypatch):
    """infer() routes through the fused graph BY DEFAULT (the 1.8x measured
    end-to-end batch-1 win, BASELINE.md); VITS_TPU_FUSED=0 restores
    two-phase; int8 serving stays two-phase until its calibration freezes."""
    d, synth, params = deploy_dir
    from vits_tpu.infer import EmoVITS
    model = EmoVITS(os.path.join(d, "checkpoint.npz"))
    assert model._prefer_fused  # default ON
    calls = []
    orig = model.infer_fused
    model.infer_fused = lambda *a, **k: calls.append(1) or orig(*a, **k)
    rng = np.random.RandomState(3)
    wav, _ = model.infer(1, rng.randn(17, 16).astype(np.float32),
                         rng.randn(1024).astype(np.float32))
    assert calls and np.all(np.isfinite(wav))
    # opt-out restores the two-phase path
    monkeypatch.setenv("VITS_TPU_FUSED", "0")
    model_2p = EmoVITS(os.path.join(d, "checkpoint.npz"))
    assert not model_2p._prefer_fused
    # quantize mode serves two-phase while calibrating (dec_q8 not frozen)
    model_q = EmoVITS(os.path.join(d, "checkpoint.npz"), quantize=True)
    model_q._prefer_fused = True
    model_q.infer_fused = lambda *a, **k: (_ for _ in ()).throw(AssertionError("fused used"))
    wavq, _ = model_q.infer(1, rng.randn(17, 16).astype(np.float32),
                            rng.randn(1024).astype(np.float32))
    assert np.all(np.isfinite(wavq))


def test_emovits_bf16_serving(deploy_dir):
    """bf16 serving mode end-to-end: fp32 requests against bf16 params must
    not be a trace error (inputs are cast in the jitted impls), across the
    two-phase, fused, and streaming paths."""
    d, synth, params = deploy_dir
    from vits_tpu.infer import EmoVITS
    model = EmoVITS(os.path.join(d, "checkpoint.npz"), compute_dtype=jnp.bfloat16,
                    frame_quantum=16)
    model32 = EmoVITS(os.path.join(d, "checkpoint.npz"))
    rng = np.random.RandomState(31)
    text = rng.randn(17, 16).astype(np.float32)
    emo = rng.randn(1024).astype(np.float32)
    np.random.seed(7)
    wav, _ = model._infer_two_phase(2, text, emo)
    np.random.seed(7)
    wav32, _ = model32._infer_two_phase(2, text, emo)
    assert wav.dtype == np.float32 and np.all(np.isfinite(wav))
    assert wav.shape == wav32.shape
    corr = np.corrcoef(wav, wav32)[0, 1]
    assert corr > 0.98, corr
    wavf, _ = model.infer_fused(2, text, emo)
    assert np.all(np.isfinite(wavf))
    np.random.seed(7)
    streamed = np.concatenate(list(model.infer_stream(2, text, emo)))
    np.testing.assert_allclose(streamed, wav, atol=1e-2)


@pytest.fixture(scope="module")
def deploy_dir_8k(tmp_path_factory):
    """Deployment whose native rate survives _parse_input's >=8000 Hz clamp,
    so VITSWrap's native (window-level) streaming path is exercised."""
    d = tmp_path_factory.mktemp("deploy8k")
    cfg = json.loads(json.dumps(TINY_JSON))
    cfg["data"]["sampling_rate"] = 8000
    with open(d / "config.json", "w") as f:
        json.dump(cfg, f)
    from vits_tpu.config import get_hparams_from_file
    hps = get_hparams_from_file(str(d / "config.json"))
    synth = Synthesizer.from_hps(hps)
    params = synth.init_params(jax.random.PRNGKey(7))
    ckpt.save_checkpoint(str(d / "checkpoint.npz"), {"model": jax.device_get(params)})
    return str(d)


def test_speaking_stream_matches_speaking(deploy_dir_8k):
    """speaking_stream's concatenated PCM == speaking()'s WAV payload at the
    native rate (including the tail-silence chunk), and the final metadata
    dict carries the same segment/timing surface."""
    from vits_tpu.vits_wrap import VITSWrap
    tts = VITSWrap(os.path.join(deploy_dir_8k, "checkpoint.npz"))
    inputs = {"text": "hello world, this is a streaming test.", "spkid": 1,
              "emotion": np.zeros(1024, np.float32), "volume": 0.8,
              "tail_silence": 0.05}
    np.random.seed(4)
    ref = tts.speaking(dict(inputs))
    np.random.seed(4)
    msgs = list(tts.speaking_stream(dict(inputs)))
    final = msgs[-1]
    assert final.get("final") is True and "wav" not in final
    pcm_chunks = [m for m in msgs[:-1]]
    assert all(m["sr"] == 8000 for m in pcm_chunks)
    assert [m["seq"] for m in pcm_chunks] == list(range(len(pcm_chunks)))
    ref_pcm = np.frombuffer(ref["wav"][44:], np.int16)
    got_pcm = np.frombuffer(b"".join(m["pcm"] for m in pcm_chunks), np.int16)
    assert got_pcm.shape == ref_pcm.shape
    # the streamed decode is the same masked graph; int16 quantization may
    # round differently by at most 1 LSB under XLA fusion differences
    assert np.abs(got_pcm.astype(np.int32) - ref_pcm.astype(np.int32)).max() <= 1
    assert final["segment_info"] and final["rtf"] > 0


def test_vits_wrap_speaking(deploy_dir):
    d, synth, params = deploy_dir
    from vits_tpu.vits_wrap import VITSWrap
    tts = VITSWrap(os.path.join(d, "checkpoint.npz"))
    out = tts.speaking({"text": "hello world, this is a test.", "spkid": 1,
                        "emotion": np.zeros(1024, np.float32), "volume": 0.8,
                        "tail_silence": 0.1})
    wav = out["wav"]
    assert wav[:4] == b"RIFF" and len(wav) > 44
    # requested rate is clamped to [8000, 48000] (vits_wrap.py:80) and the
    # tiny model's native 1600 Hz is resampled up
    assert out["sr"] == 8000
    assert out["rtf"] > 0 and out["segment_info"]
    # long text gets split into multiple segments
    long_text = "你好。" * 100
    out2 = tts.speaking({"text": long_text, "spkid": 1,
                         "emotion": np.zeros(1024, np.float32)})
    assert len(out2["segment_info"]) > 1
    # pitch / resample path
    out3 = tts.speaking({"text": "abc", "spkid": 1, "pitch": 1.2,
                         "sampling_rate": 16000,
                         "emotion": np.zeros(1024, np.float32)})
    assert out3["sr"] == 16000
