"""End-to-end tiny training run through vits_tpu.train.loop.run (CPU)."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vits_tpu.config import HParams
from vits_tpu.parallel.mesh import make_mesh
from vits_tpu.train.loop import run, align_noise_at, count_params
from vits_tpu.utils.audio import write_wav
from vits_tpu.utils import checkpoint as ckpt

HOP = 8
SR = 1600
TEXT_C = 16


def make_corpus(tmp_path, n=8):
    rng = np.random.RandomState(11)
    lines = []
    for i in range(n):
        T = rng.randint(16, 56) * HOP
        write_wav(str(tmp_path / f"u{i}.wav"),
                  rng.uniform(-0.9, 0.9, T).astype(np.float32), SR)
        rng.randn(rng.randint(4, 12), TEXT_C).astype(np.float32).tofile(str(tmp_path / f"u{i}.vec"))
        rng.randn(1024).astype(np.float32).tofile(str(tmp_path / f"u{i}.emo"))
        lines.append(f"{tmp_path}/u{i}.vec|{tmp_path}/u{i}.wav|{tmp_path}/u{i}.emo|{i % 4}")
    for name, subset in [("train.scp", lines), ("valid.scp", lines[:2])]:
        with open(tmp_path / name, "w") as f:
            f.write("\n".join(subset))
    return str(tmp_path / "train.scp"), str(tmp_path / "valid.scp")


def make_hps(tmp_path, train_scp, valid_scp):
    return HParams(**{
        "train": {
            "log_interval": 2, "eval_interval": 4, "seed": 1234, "epochs": 3,
            "steps": 3000, "learning_rate": 2e-4, "betas": [0.8, 0.99],
            "eps": 1e-9, "batch_size": 2, "lr_decay": 0.999875,
            "segment_size": HOP * 8, "weight_decay": 0.01, "c_mel": 45,
            "c_dur": 2, "c_kl": 1.0, "c_kl_q": 0.01, "align_noise": 1e-2,
            "align_noise_decay": 1e-6, "align_noise_min": 1e-4,
            "bucket_boundaries": [8, 32, 64],
        },
        "data": {
            "training_files": train_scp, "validation_files": valid_scp,
            "max_text_len": 384, "max_wav_len": SR * 12, "text_channels": TEXT_C,
            "sampling_rate": SR, "filter_length": 64, "hop_length": HOP,
            "win_length": 64, "n_mel_channels": 20, "mel_fmin": 0.0,
            "mel_fmax": None, "n_speakers": 8, "noise_scale": 0.707,
        },
        "model": {
            "inter_channels": 8, "hidden_channels": 16, "filter_channels": 24,
            "n_heads": 2, "n_layers": 2, "kernel_size": 3, "p_dropout": 0.1,
            "ffn": "FFN2", "resblock": "2", "resblock_kernel_sizes": [3],
            "resblock_dilation_sizes": [[1, 3]], "upsample_rates": [4, 2],
            "upsample_initial_channel": 64, "upsample_kernel_sizes": [8, 4],
            "kernel_size_q": 5, "n_layers_q": 3, "hidden_size_d": 16,
            "kernel_size_d": 5, "p_dropout_d": 0.5, "act_func_d": "ReLU",
            "use_spectral_norm": False, "dilation_rate": [1, 1], "n_flows": 2,
            "gin_channels": 16,
        },
    })


def test_align_noise_schedule():
    hps = HParams(**{"train": {"align_noise": 0.01, "align_noise_decay": 1e-3,
                               "align_noise_min": 1e-4}})
    assert align_noise_at(hps, 0) == 0.01
    assert abs(align_noise_at(hps, 5) - 0.005) < 1e-12
    assert align_noise_at(hps, 10_000) == 1e-4


def test_log_train_summaries_reference_tags():
    """log_train_summaries emits the reference scalar/image tag set
    (train.py:253-276): per-sub-disc indexed losses + the 4 images."""
    from vits_tpu.train.loop import log_train_summaries

    class FakeWriter:
        def __init__(self):
            self.scalars, self.images = {}, {}
        def add_scalar(self, tag, v, step):
            self.scalars[tag] = v
        def add_image(self, tag, img, step):
            self.images[tag] = img
        def add_audio(self, *a, **k):
            pass

    m = {
        "loss_g_total": 1.0, "loss_disc": 2.0, "loss_fm": 0.5, "loss_mel": 3.0,
        "loss_dur": 0.1, "loss_kl": 0.2, "loss_kl_q": 0.01,
        "grad_norm_d": 4.0, "grad_norm_g": 5.0,
        "losses_g": np.array([0.1, 0.2]), "losses_d_r": np.array([0.3, 0.4]),
        "losses_d_g": np.array([0.5, 0.6]),
        "viz_mel_org": np.random.rand(8, 20).astype(np.float32),
        "viz_mel_gen": np.random.rand(8, 20).astype(np.float32),
        "viz_mel_all": np.random.rand(24, 20).astype(np.float32),
        "viz_attn": np.eye(12, 5, dtype=np.float32),
        "audio_sec_per_s": 100.0,
        "loss_gen": 0.3,
    }
    w = FakeWriter()
    scalars, images = log_train_summaries(w, 10, m, lr=2e-4)
    for tag in ["loss/g/total", "loss/d/total", "loss/g/fm", "loss/g/mel",
                "loss/g/dur", "loss/g/kl", "loss/g/kl_q", "learning_rate",
                "grad_norm_d", "grad_norm_g",
                "loss/g/0", "loss/g/1", "loss/d_r/0", "loss/d_r/1",
                "loss/d_g/0", "loss/d_g/1", "audio_sec_per_s"]:
        assert tag in w.scalars, tag
    assert w.scalars["loss/d_r/1"] == pytest.approx(0.4)
    for tag in ["slice/mel_org", "slice/mel_gen", "all/mel", "all/attn"]:
        assert tag in w.images and w.images[tag].ndim == 3, tag
    # viz_* tensors must never leak into the scalar namespace, and the
    # aggregate adversarial loss_gen has no reference tag (advisor r4) —
    # only the per-sub loss/g/{i} exist
    assert not any(t.startswith("viz") or "mel_org" in t for t in w.scalars)
    assert "loss/loss_gen" not in w.scalars and "loss_gen" not in w.scalars


def test_tiny_training_run(tmp_path):
    train_scp, valid_scp = make_corpus(tmp_path)
    hps = make_hps(tmp_path, train_scp, valid_scp)
    hps.model_dir = str(tmp_path / "logs")
    os.makedirs(hps.model_dir, exist_ok=True)
    mesh = make_mesh(devices=jax.devices()[:1])
    logged = []
    state, steps = run(hps, variant="mel", max_steps=4, mesh=mesh,
                       log_cb=lambda s, m: logged.append((s, m)))
    assert steps == 4
    assert logged and all(np.isfinite(list(m.values())).all() for _, m in logged)
    # checkpoints written by final save
    assert ckpt.latest_checkpoint_path(hps.model_dir, "G_*.npz")
    assert ckpt.latest_checkpoint_path(hps.model_dir, "D_*.npz")

    # resume: a fresh run picks up the checkpoint
    state2, steps2 = run(hps, variant="mel", max_steps=6, mesh=mesh)
    assert steps2 == 6
