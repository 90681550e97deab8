"""Jitted GAN training steps.

Capability parity with the reference's per-batch loop (train.py:170-242 for the
mel/MPD variant; train_stft.py:162-236 for the multi-res-STFT/MRD variant),
restructured for XLA:

  * ONE jitted function performs D-step then G-step (the reference's two
    backward passes + optimizer steps), with the generator forward computed
    once and shared via `jax.vjp` — the D step consumes its value, the G step
    pulls gradients back through the saved residuals. This mirrors torch
    autograd's retained graph without recomputation.
  * The reference's ordering is preserved: D is updated first and the G
    adversarial loss is computed against the UPDATED discriminator.
  * clip_grad_value_(params, None) semantics: gradients are not clipped, only
    the global norm is reported (commons.py:158-173, train.py:213,240).
  * LR and align-noise are runtime scalars (no recompiles as they decay).
  * Optional bf16 compute: activations run in bfloat16 on the MXU, losses and
    optimizer state stay float32 (replaces torch AMP fp16 + GradScaler —
    bf16 needs no loss scaling).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from vits_tpu.ops.seq import clip_grad_value, slice_segments_1d
from vits_tpu.ops.stft import mel_spectrogram, spec_to_mel
from vits_tpu.nn.core import sn_update
from vits_tpu.train import losses as L


@dataclasses.dataclass(frozen=True)
class TrainStepConfig:
    variant: str  # "mel" (train.py) | "stft" (train_stft.py)
    segment_frames: int
    hop_length: int
    filter_length: int
    win_length: int
    n_mel_channels: int
    sampling_rate: int
    mel_fmin: float = 0.0
    mel_fmax: Optional[float] = None
    c_mel: float = 45.0
    c_stft: float = 25.0
    c_dur: float = 2.0
    c_kl: float = 1.0
    c_kl_q: float = 0.01
    use_dur_dis: bool = False
    mas_impl: str = "auto"
    compute_dtype: Any = jnp.float32
    resolutions: Tuple[Tuple[int, int, int], ...] = L.DEFAULT_RESOLUTIONS

    @classmethod
    def from_hps(cls, hps, variant="mel", use_dur_dis=False, mas_impl="auto",
                 compute_dtype=jnp.float32):
        t, d = hps.train, hps.data
        return cls(
            variant=variant,
            segment_frames=t.segment_size // d.hop_length,
            hop_length=d.hop_length,
            filter_length=d.filter_length,
            win_length=d.win_length,
            n_mel_channels=d.n_mel_channels,
            sampling_rate=d.sampling_rate,
            mel_fmin=d.mel_fmin,
            mel_fmax=d.mel_fmax,
            c_mel=t.c_mel,
            c_stft=getattr(t, "c_stft", 25.0),
            c_dur=t.c_dur,
            c_kl=t.c_kl,
            c_kl_q=t.c_kl_q,
            use_dur_dis=use_dur_dis,
            mas_impl=mas_impl,
            compute_dtype=compute_dtype,
        )


_DIFF_KEYS = ("y_hat", "l_length", "z_p", "m_p", "logs_p", "m_q", "logs_q",
              "z_q", "logw", "x_hidden")
_AUX_KEYS = ("attn", "ids_slice", "x_mask", "y_mask", "logw_")


def make_train_step(synth, disc, cfg: TrainStepConfig, gen_opt, disc_opt,
                    dur_disc=None, dur_opt=None):
    """Build the jitted train step.

    synth: models.synthesizer.Synthesizer; disc: MultiPeriodDiscriminator
    (variant "mel") or MultiWaveSTFTDiscriminator (variant "stft");
    gen_opt/disc_opt: train.optim.Optimizer.

    state: {"gen", "disc", "gen_opt", "disc_opt", "step"[, "dur", "dur_opt"]}
    batch: {"x","x_lengths","spec","spec_lengths","wav","emo","sid"} with
    x (B,Tx,C) float, spec (B,Ty,F), wav (B,T).
    Returns (new_state, metrics).
    """

    def mel_of(wav):
        return mel_spectrogram(wav, cfg.filter_length, cfg.n_mel_channels,
                               cfg.sampling_rate, cfg.hop_length, cfg.win_length,
                               cfg.mel_fmin, cfg.mel_fmax)

    def train_step(state, batch, rng, lr_g, lr_d, align_noise, lr_p=1e-4):
        rng_fwd, rng_step = jax.random.split(rng)
        cd = cfg.compute_dtype

        # compact batches (data.collate compact=True) ship the wav as int16
        # PCM; dequantize on device at the collate's 32767 scale
        wav = batch["wav"]
        if wav.dtype == jnp.int16:
            wav = wav.astype(jnp.float32) * jnp.float32(1.0 / 32767.0)
        else:
            wav = wav.astype(jnp.float32)

        # Spectrogram source: host-provided (reference pipeline parity /
        # multi-host) or computed ON DEVICE from the waveform when the batch
        # ships without "spec" — 52 MB/batch less host→device traffic at the
        # base config; the collate reflect-tail keeps valid frames equal to
        # the reference's exact-length STFT (data.collate).
        if "spec" in batch:
            spec_f32 = batch["spec"].astype(jnp.float32)
        else:
            # spec-less batches carry filter_length extra wav samples (the
            # collate reflect tail); slice back to the bucket's frame count
            from vits_tpu.ops.stft import spectrogram
            frames = (wav.shape[1] - cfg.filter_length) // cfg.hop_length
            spec_f32 = spectrogram(wav, cfg.filter_length, cfg.hop_length,
                                   cfg.win_length)[:, :frames]

        def cast_p(tree):
            # mixed-precision param cast (the reference runs D under fp16
            # autocast, train.py:202-206); grads flow back to fp32 masters
            if cd == jnp.float32:
                return tree
            return jax.tree_util.tree_map(
                lambda a: a.astype(cd) if a.dtype == jnp.float32 else a, tree)

        def fwd(gen_params):
            gp = cast_p(gen_params)
            out = synth.forward(
                gp, rng_fwd,
                batch["x"].astype(cd), batch["x_lengths"],
                spec_f32.astype(cd), batch["spec_lengths"],
                batch["emo"].astype(cd), batch["sid"],
                align_noise=align_noise, mas_impl=cfg.mas_impl, train=True)
            diff = {k: out[k] for k in _DIFF_KEYS}
            if cfg.variant == "stft":
                # the 5-resolution |STFT| of y_hat is computed ONCE here and
                # shared by the D step (stop-grad), the sc/mag losses, and the
                # G adversarial pass — the reference's single mstft_loss call
                # feeding all three (train_stft.py:195-199,219-224)
                y_hat_f = out["y_hat"].astype(jnp.float32)[..., 0]
                diff["mags_fake"] = tuple(
                    L.stft_magnitude(y_hat_f, *res) for res in cfg.resolutions)
            aux = {k: out[k] for k in _AUX_KEYS}
            return diff, aux

        (diff, vjp_fn, aux) = jax.vjp(fwd, state["gen"], has_aux=True)
        ids = aux["ids_slice"]
        seg = cfg.segment_frames * cfg.hop_length
        y_slice = slice_segments_1d(wav, ids * cfg.hop_length, seg)[..., None]
        y_hat = diff["y_hat"].astype(jnp.float32)
        y_hat_sg = jax.lax.stop_gradient(y_hat)

        # ---------------- D step (train.py:204-214) ----------------
        # D runs in the compute dtype like the reference's fp16 autocast;
        # losses cast to f32 internally, grads land on the f32 master params.
        y_slice_c = y_slice.astype(cd)
        y_hat_sg_c = y_hat_sg.astype(cd)
        if cfg.variant == "mel":
            def d_loss_fn(dp):
                y_d_r, y_d_g, _, _ = disc.apply(cast_p(dp), y_slice_c, y_hat_sg_c)
                loss_disc, r_losses, g_losses = L.discriminator_loss(y_d_r, y_d_g)
                return loss_disc, (r_losses, g_losses)
        else:
            # STFT magnitudes stay f32 (loss numerics); disc consumes them in
            # cd. Real mags computed once; fake mags shared from fwd.
            mags_real = tuple(L.stft_magnitude(y_slice[..., 0], *res)
                              for res in cfg.resolutions)
            mags_real_c = [m.astype(cd) for m in mags_real]
            mags_fake_c = [m.astype(cd) for m in
                           jax.lax.stop_gradient(diff["mags_fake"])]

            def d_loss_fn(dp):
                # real+fake as ONE batched MRD pass (identical values, half
                # the discriminator ops in the HLO — the stft-step compile
                # scales with disc op count)
                B = y_slice_c.shape[0]
                both = disc.apply(
                    cast_p(dp),
                    jnp.concatenate([y_slice_c, y_hat_sg_c], axis=0),
                    [jnp.concatenate([mr, mf], axis=0)
                     for mr, mf in zip(mags_real_c, mags_fake_c)])
                y_d_r = [s[:B] for s in both]
                y_d_g = [s[B:] for s in both]
                loss_disc, r_losses, g_losses = L.discriminator_loss(y_d_r, y_d_g)
                return loss_disc, (r_losses, g_losses)

        (loss_disc, (losses_d_r, losses_d_g)), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(state["disc"])
        d_grads, grad_norm_d = clip_grad_value(d_grads, None)
        d_updates, disc_opt_state = disc_opt.update(d_grads, state["disc_opt"], state["disc"], lr_d)
        new_disc = jax.tree_util.tree_map(lambda p, u: p + u, state["disc"], d_updates)
        # Advance the spectral-norm power iteration once per step. torch's
        # spectral_norm power-iterates on every forward (so u advances twice
        # per reference step: D pass and G pass); here the D pass uses the
        # incoming u and the G pass below uses this advanced u — same
        # fixed-point, u trails torch's by one half-step. Documented
        # deviation: sigma converges to the same top singular value either
        # way and the GAN objective is unaffected beyond warmup noise.
        new_disc = sn_update(new_disc)

        # duration discriminator D step (train.py:205,215-220)
        new_dur = state.get("dur")
        dur_opt_state = state.get("dur_opt")
        if cfg.use_dur_dis and dur_disc is not None:
            x_hidden_sg = jax.lax.stop_gradient(diff["x_hidden"])
            logw_pred_sg = jax.lax.stop_gradient(diff["logw"])

            def p_loss_fn(pp):
                # P runs in the compute dtype like the other discriminators
                # (fp16 autocast in the reference); grads land on f32 masters
                d_r, d_g = dur_disc.apply(cast_p(pp), x_hidden_sg, aux["x_mask"],
                                          aux["logw_"], logw_pred_sg)
                loss_p, pr, pg = L.discriminator_loss(d_r, d_g)
                return loss_p, (pr, pg)
            (loss_disc_p, (losses_p_r, losses_p_g)), p_grads = \
                jax.value_and_grad(p_loss_fn, has_aux=True)(state["dur"])
            p_grads, grad_norm_p = clip_grad_value(p_grads, None)
            # P lr is a runtime scalar: base 1e-4 decayed per epoch by the
            # caller (reference train.py:100-102 AdamW(1e-4) + scheduler_p,
            # train.py:137,148)
            p_updates, dur_opt_state = dur_opt.update(p_grads, state["dur_opt"], state["dur"], lr_p)
            new_dur = jax.tree_util.tree_map(lambda p, u: p + u, state["dur"], p_updates)
        else:
            loss_disc_p = jnp.zeros(())
            grad_norm_p = jnp.zeros(())

        # ---------------- G step (train.py:222-242) ----------------
        def g_loss_fn(diff_outs):
            y_hat_g = diff_outs["y_hat"].astype(jnp.float32)
            metrics = {}
            loss_dur = jnp.sum(diff_outs["l_length"].astype(jnp.float32)) * cfg.c_dur
            loss_kl = L.kl_loss(diff_outs["z_p"], diff_outs["logs_q"],
                                diff_outs["m_p"], diff_outs["logs_p"], aux["y_mask"]) * cfg.c_kl
            loss_kl_q = L.kl_loss(diff_outs["z_q"], diff_outs["logs_p"],
                                  diff_outs["m_q"], diff_outs["logs_q"], aux["y_mask"]) * cfg.c_kl_q
            if cfg.variant == "mel":
                mel_full = spec_to_mel(spec_f32, cfg.filter_length,
                                       cfg.n_mel_channels, cfg.sampling_rate,
                                       cfg.mel_fmin, cfg.mel_fmax)
                from vits_tpu.ops.seq import slice_segments
                y_mel = slice_segments(mel_full, ids, cfg.segment_frames)
                y_hat_mel = mel_of(y_hat_g[..., 0])
                loss_mel = jnp.mean(jnp.abs(y_mel - y_hat_mel)) * cfg.c_mel
                y_d_r, y_d_g, fmap_r, fmap_g = disc.apply(
                    cast_p(new_disc), y_slice_c, y_hat_g.astype(cd))
                loss_fm = L.feature_loss(fmap_r, fmap_g)
                loss_gen, gen_losses = L.generator_loss(y_d_g)
                loss_all = loss_gen + loss_fm + loss_mel + loss_dur + loss_kl + loss_kl_q
                metrics.update({"loss_mel": loss_mel, "loss_fm": loss_fm})
                # training-time image summaries (train.py:266-276): element-0
                # mel slices + the full GT mel; tensors only — the host plots
                # at log steps (loop.log_train_summaries)
                metrics["viz_mel_org"] = jax.lax.stop_gradient(y_mel[0])
                metrics["viz_mel_gen"] = jax.lax.stop_gradient(y_hat_mel[0])
                metrics["viz_mel_all"] = jax.lax.stop_gradient(mel_full[0])
            else:
                mags_fake = diff_outs["mags_fake"]
                sc_loss, mag_loss = L.multi_resolution_stft_losses(
                    mags_real, mags_fake)
                loss_stft = (sc_loss + mag_loss) * cfg.c_stft
                y_d_g = disc.apply(cast_p(new_disc), y_hat_g.astype(cd),
                                   [m.astype(cd) for m in mags_fake])
                loss_gen, gen_losses = L.generator_loss(y_d_g)
                loss_all = loss_gen + loss_stft + loss_dur + loss_kl + loss_kl_q
                metrics.update({"loss_stft": loss_stft})
                # viz mels on element 0 only (train_stft.py:173-191 computes
                # them on [:1] purely for the image summaries)
                from vits_tpu.ops.seq import slice_segments
                mel_1 = spec_to_mel(spec_f32[:1], cfg.filter_length,
                                    cfg.n_mel_channels, cfg.sampling_rate,
                                    cfg.mel_fmin, cfg.mel_fmax)
                y_mel_1 = slice_segments(mel_1, ids[:1], cfg.segment_frames)
                y_hat_mel_1 = mel_of(y_hat_g[:1, :, 0])
                metrics["viz_mel_org"] = jax.lax.stop_gradient(y_mel_1[0])
                metrics["viz_mel_gen"] = jax.lax.stop_gradient(y_hat_mel_1[0])
            if cfg.use_dur_dis and dur_disc is not None:
                _, d_g = dur_disc.apply(cast_p(new_dur), diff_outs["x_hidden"],
                                        aux["x_mask"], aux["logw_"],
                                        diff_outs["logw"])
                loss_gen_p, losses_gen_p = L.generator_loss(d_g)
                loss_all = loss_all + loss_gen_p
                metrics["loss_gen_p"] = loss_gen_p
                metrics["losses_p"] = jnp.stack(losses_gen_p)
            metrics.update({"loss_gen": loss_gen, "loss_dur": loss_dur,
                            "loss_kl": loss_kl, "loss_kl_q": loss_kl_q,
                            "loss_g_total": loss_all})
            metrics["losses_g"] = jnp.stack(gen_losses)
            return loss_all, metrics

        (loss_g, g_metrics), diff_grads = jax.value_and_grad(g_loss_fn, has_aux=True)(diff)
        (gen_grads,) = vjp_fn(jax.tree_util.tree_map(
            lambda d, g: g.astype(d.dtype), diff, diff_grads))
        gen_grads = jax.tree_util.tree_map(lambda a: a.astype(jnp.float32), gen_grads)
        gen_grads, grad_norm_g = clip_grad_value(gen_grads, None)
        g_updates, gen_opt_state = gen_opt.update(gen_grads, state["gen_opt"], state["gen"], lr_g)
        new_gen = jax.tree_util.tree_map(lambda p, u: p + u, state["gen"], g_updates)

        new_state = dict(state)
        new_state.update({"gen": new_gen, "disc": new_disc,
                          "gen_opt": gen_opt_state, "disc_opt": disc_opt_state,
                          "step": state["step"] + 1})
        if cfg.use_dur_dis and dur_disc is not None:
            new_state.update({"dur": new_dur, "dur_opt": dur_opt_state})
        metrics = dict(g_metrics)
        metrics.update({"loss_disc": loss_disc, "grad_norm_d": grad_norm_d,
                        "grad_norm_g": grad_norm_g, "loss_disc_p": loss_disc_p,
                        "grad_norm_p": grad_norm_p})
        metrics["losses_d_r"] = jnp.stack(losses_d_r)
        metrics["losses_d_g"] = jnp.stack(losses_d_g)
        if cfg.use_dur_dis and dur_disc is not None:
            metrics["losses_p_r"] = jnp.stack(losses_p_r)
            metrics["losses_p_g"] = jnp.stack(losses_p_g)
        # element-0 MAS alignment (train.py:274 `all/attn` — the de-facto
        # MAS-health signal); (T_y, T_x) hard path
        metrics["viz_attn"] = aux["attn"][0]
        return new_state, metrics

    return train_step


def jit_train_step(train_step, donate_state=True):
    return jax.jit(train_step, donate_argnums=(0,) if donate_state else ())
