#!/usr/bin/env python3
"""Bisect the full train step: time each composed piece on chip.

Usage: python scripts/profile_step.py [batch] [frames] [fp32|bf16]
"""

import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def timed(fn, *a, iters=3):
    out = fn(*a)
    jax.tree_util.tree_map(lambda x: np.asarray(x) if hasattr(x, "dtype") else x,
                           jax.tree_util.tree_leaves(out)[:1])
    t0 = time.time()
    for _ in range(iters):
        out = fn(*a)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    return (time.time() - t0) / iters


def main():
    from vits_tpu.config import get_hparams_from_file, default_config_path
    from vits_tpu.train.loop import build_models, build_optimizers, init_state
    from vits_tpu.train.step import TrainStepConfig
    from vits_tpu.ops.seq import clip_grad_value, slice_segments_1d
    from vits_tpu.nn.core import sn_update
    from vits_tpu.train import losses as L

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    T_y = int(sys.argv[2]) if len(sys.argv) > 2 else 400
    dtype = sys.argv[3] if len(sys.argv) > 3 else "bf16"
    T_x = 96

    hps = get_hparams_from_file(default_config_path("base"))
    hps.adapt = False
    hps.use_dur_dis = False
    synth, disc, _ = build_models(hps, "mel", False)
    gen_opt, disc_opt, _ = build_optimizers(hps, "mel", False)
    state = init_state(hps, synth, disc, None, gen_opt, disc_opt, None)
    cd = jnp.bfloat16 if dtype == "bf16" else jnp.float32
    cfg = TrainStepConfig.from_hps(hps, variant="mel", compute_dtype=cd)

    rng = np.random.RandomState(0)
    F = hps.data.filter_length // 2 + 1
    hop = hps.data.hop_length
    batch = {
        "x": jnp.asarray(rng.randn(B, T_x, hps.data.text_channels).astype(np.float32)),
        "x_lengths": jnp.asarray([T_x] * B, jnp.int32),
        "spec": jnp.asarray(np.abs(rng.randn(B, T_y, F)).astype(np.float32)),
        "spec_lengths": jnp.asarray([T_y] * B, jnp.int32),
        "wav": jnp.asarray(rng.uniform(-0.5, 0.5, (B, T_y * hop)).astype(np.float32)),
        "emo": jnp.asarray(rng.randn(B, 1024).astype(np.float32)),
        "sid": jnp.asarray(rng.randint(0, hps.data.n_speakers, B), jnp.int32),
    }
    res = {"dtype": dtype, "B": B, "T_y": T_y}

    seg = cfg.segment_frames * cfg.hop_length
    y_hat_np = jnp.asarray(rng.uniform(-0.5, 0.5, (B, seg, 1)).astype(np.float32))
    y_slice = slice_segments_1d(batch["wav"], jnp.zeros((B,), jnp.int32), seg)[..., None]

    # 1. forward alone (vjp residual version)
    def fwd(gp):
        gp2 = jax.tree_util.tree_map(
            lambda a: a.astype(cd) if a.dtype == jnp.float32 else a, gp) \
            if cd != jnp.float32 else gp
        out = synth.forward(gp2, jax.random.PRNGKey(0), batch["x"].astype(cd),
                            batch["x_lengths"], batch["spec"].astype(cd),
                            batch["spec_lengths"], batch["emo"].astype(cd),
                            batch["sid"], align_noise=0.01, mas_impl=cfg.mas_impl,
                            train=True)
        return out["y_hat"]

    f1 = jax.jit(lambda gp: jnp.sum(fwd(gp).astype(jnp.float32)))
    res["fwd_ms"] = round(timed(f1, state["gen"]) * 1e3, 2)
    print(json.dumps(res), flush=True)

    # 2. forward + full vjp pullback
    def fwd_bwd(gp):
        y, vjp_fn = jax.vjp(fwd, gp)
        (g,) = vjp_fn(jnp.ones_like(y))
        return jnp.sum(y.astype(jnp.float32)), g
    def _fwd_bwd_sum(gp):
        y, g = fwd_bwd(gp)
        return y + sum(l.astype(jnp.float32).sum()
                       for l in jax.tree_util.tree_leaves(g)[:4])
    f2 = jax.jit(_fwd_bwd_sum)
    res["fwd_vjp_ms"] = round(timed(f2, state["gen"]) * 1e3, 2)
    print(json.dumps(res), flush=True)

    # 3. D loss grad alone (static y_hat)
    def d_step(dp):
        def d_loss_fn(p):
            y_d_r, y_d_g, _, _ = disc.apply(p, y_slice, y_hat_np)
            loss, _, _ = L.discriminator_loss(y_d_r, y_d_g)
            return loss
        loss, g = jax.value_and_grad(d_loss_fn)(dp)
        return loss + sum(l.astype(jnp.float32).sum()
                          for l in jax.tree_util.tree_leaves(g)[:4])
    f3 = jax.jit(d_step)
    res["d_grad_ms"] = round(timed(f3, state["disc"]) * 1e3, 2)
    print(json.dumps(res), flush=True)

    # 4. D apply fwd only
    f4 = jax.jit(lambda dp: jax.tree_util.tree_leaves(
        disc.apply(dp, y_slice, y_hat_np))[0].sum())
    res["d_fwd_ms"] = round(timed(f4, state["disc"]) * 1e3, 2)
    print(json.dumps(res), flush=True)

    # 5. optimizer updates alone
    zeros_g = jax.tree_util.tree_map(jnp.zeros_like, state["gen"])
    def opt_g(s):
        g, norm = clip_grad_value(zeros_g, None)
        u, os2 = gen_opt.update(g, s, state["gen"], 2e-4)
        return jax.tree_util.tree_leaves(u)[0].sum() + norm
    f5 = jax.jit(opt_g)
    res["opt_g_ms"] = round(timed(f5, state["gen_opt"]) * 1e3, 2)
    print(json.dumps(res), flush=True)

    # 6. sn_update alone
    f6 = jax.jit(lambda dp: jax.tree_util.tree_leaves(sn_update(dp))[0].sum())
    res["sn_update_ms"] = round(timed(f6, state["disc"]) * 1e3, 2)
    print(json.dumps(res), flush=True)

    # 7. mel losses alone
    from vits_tpu.ops.stft import mel_spectrogram, spec_to_mel
    def mels(w):
        m1 = mel_spectrogram(w[..., 0], cfg.filter_length, cfg.n_mel_channels,
                             cfg.sampling_rate, cfg.hop_length, cfg.win_length,
                             cfg.mel_fmin, cfg.mel_fmax)
        return jnp.sum(m1)
    f7 = jax.jit(mels)
    res["mel_ms"] = round(timed(f7, y_hat_np) * 1e3, 2)
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
