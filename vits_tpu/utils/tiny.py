"""Tiny-config constructors shared by tests and the driver dry-run.

tests/test_train_step.py and __graft_entry__.dryrun_multichip exercise the
same tiny stft/MRD trainer; keeping the discriminator + TrainStepConfig
construction here means the two stay in sync when the tiny config changes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

TINY_RESOLUTIONS = ((64, 16, 64), (32, 8, 32))


def tiny_mrd_disc():
    """Tiny MultiWaveSTFTDiscriminator matching TINY_RESOLUTIONS."""
    from vits_tpu.models.mrd import MultiWaveSTFTDiscriminator
    return MultiWaveSTFTDiscriminator(
        num_dwt=2, wave_layers=4,
        fft_sizes=(64, 32), hop_sizes=(16, 8), win_sizes=(64, 32),
        stft_num_layers=(3, 3), stft_kernel_sizes=(3, 3),
        stft_conv_channels=(8, 8))


def tiny_step_config(variant="mel", **kw):
    """TrainStepConfig at the tiny scale (hop 8, 64-pt STFT)."""
    from vits_tpu.train.step import TrainStepConfig
    return TrainStepConfig(
        variant=variant, segment_frames=8, hop_length=8, filter_length=64,
        win_length=64, n_mel_channels=20, sampling_rate=1600, mas_impl="scan",
        resolutions=TINY_RESOLUTIONS, **kw)


def init_gan_state(synth, disc, gen_opt, disc_opt, dur_disc=None, dur_opt=None,
                   seed=0):
    """Fresh {gen, disc, opts, step} training state (loop.init_state without
    the HParams plumbing)."""
    kg, kd, kp = jax.random.split(jax.random.PRNGKey(seed), 3)
    state = {"gen": synth.init_params(kg), "disc": disc.init_params(kd),
             "step": jnp.zeros((), jnp.int32)}
    state["gen_opt"] = gen_opt.init(state["gen"])
    state["disc_opt"] = disc_opt.init(state["disc"])
    if dur_disc is not None:
        state["dur"] = dur_disc.init_params(kp)
        state["dur_opt"] = dur_opt.init(state["dur"])
    return state
