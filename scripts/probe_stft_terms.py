#!/usr/bin/env python3
"""Term-by-term decomposition of the stft/MRD train step (VERDICT r4 task 2).

probe_mrd_families.py timed the discriminator families (~120 ms of the
259 ms step) and attributed the remainder to "the shared generator fwd/vjp"
without ever measuring it — or the 5-resolution |STFT| of y_hat computed
INSIDE the vjp'd forward (train/step.py fwd: mags_fake) — in isolation.
This probe times, with the per-step-sync methodology (scalar-checksum
device_get per iteration):

  gen_fwd_vjp        synthesizer forward + full parameter pullback (shared
                     by BOTH trainer variants), batch 32 x 400 frames
  gen_fwd_vjp_mags   same, with the 5-res |STFT| of y_hat inside the vjp
                     (the stft variant's actual shared graph)
  mags5_fwd / _vjp   the 5-res stft_magnitude of a (32, 9216) slice alone
  mel_branch_grad    the mel variant's extra loss branch (y_hat mel + L1)
  opt_gen_adamw      AdamW update on the generator tree
  opt_disc_radam     RAdam update on the MRD tree

Summing these with probe_mrd_families' D+G numbers reconciles (or indicts)
the 259 ms. Reference surface: train_stft.py:162-236.
"""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp

DT = jnp.bfloat16


def _tree_sum(t):
    return sum(jnp.sum(x.astype(jnp.float32)) for x in jax.tree_util.tree_leaves(t))


_CK = jax.jit(_tree_sum)


def timeit(fn, *args, iters=10):
    t0 = time.time()
    out = fn(*args)
    jax.device_get(_CK(out))
    compile_s = time.time() - t0
    times = []
    for _ in range(iters):
        t0 = time.time()
        out = fn(*args)
        jax.device_get(_CK(out))
        times.append(time.time() - t0)
    return float(np.median(times)), compile_s


def emit(name, dt, compile_s):
    print(json.dumps({"piece": name, "ms": round(dt * 1e3, 2),
                      "compile_s": round(compile_s, 1)}), flush=True)


def main():
    from vits_tpu.config import get_hparams_from_file, default_config_path
    from vits_tpu.train.loop import build_models, build_optimizers, init_state
    from vits_tpu.train.step import TrainStepConfig, _DIFF_KEYS
    from vits_tpu.train import losses as L
    from vits_tpu.ops.stft import mel_spectrogram, spec_to_mel

    hps = get_hparams_from_file(default_config_path("base"))
    B, T_x, T_y = 32, 96, 400
    hop = hps.data.hop_length
    seg = hps.train.segment_size  # 9216 samples

    synth, disc, _ = build_models(hps, "stft", False)
    gen_opt, disc_opt, _ = build_optimizers(hps, "stft", False)
    state = init_state(hps, synth, disc, None, gen_opt, disc_opt, None)
    cfg = TrainStepConfig.from_hps(hps, variant="stft", compute_dtype=DT)

    rng = np.random.RandomState(0)
    F = hps.data.filter_length // 2 + 1
    batch = {
        "x": jnp.asarray(rng.randn(B, T_x, hps.data.text_channels).astype(np.float32)),
        "x_lengths": jnp.asarray([T_x - (i % 7) for i in range(B)], jnp.int32),
        "spec": jnp.asarray(np.abs(rng.randn(B, T_y, F)).astype(np.float32)),
        "spec_lengths": jnp.asarray([T_y - 13 * (i % 4) for i in range(B)], jnp.int32),
        "emo": jnp.asarray(rng.randn(B, 1024).astype(np.float32)),
        "sid": jnp.asarray(rng.randint(0, hps.data.n_speakers, B), jnp.int32),
    }
    wav_slice = jnp.asarray(rng.uniform(-0.5, 0.5, (B, seg)).astype(np.float32))

    def cast_p(tree):
        return jax.tree_util.tree_map(
            lambda a: a.astype(DT) if a.dtype == jnp.float32 else a, tree)

    key = jax.random.PRNGKey(1)

    def gen_fwd(gp, with_mags):
        out = synth.forward(
            cast_p(gp), key,
            batch["x"].astype(DT), batch["x_lengths"],
            batch["spec"].astype(DT), batch["spec_lengths"],
            batch["emo"].astype(DT), batch["sid"],
            align_noise=0.01, mas_impl="auto", train=True)
        diff = {k: out[k] for k in _DIFF_KEYS}
        if with_mags:
            y_hat_f = out["y_hat"].astype(jnp.float32)[..., 0]
            diff["mags_fake"] = tuple(
                L.stft_magnitude(y_hat_f, *res) for res in cfg.resolutions)
        return diff

    def fwd_vjp(gp, with_mags):
        diff, pull = jax.vjp(lambda p: gen_fwd(p, with_mags), gp)
        ct = jax.tree_util.tree_map(jnp.ones_like, diff)
        (grads,) = pull(ct)
        return grads

    emit("gen_fwd_only", *timeit(jax.jit(lambda p: gen_fwd(p, False)), state["gen"]))
    emit("gen_fwd_vjp", *timeit(jax.jit(lambda p: fwd_vjp(p, False)), state["gen"]))
    emit("gen_fwd_vjp_mags", *timeit(jax.jit(lambda p: fwd_vjp(p, True)), state["gen"]))

    # 5-res |STFT| of the slice, alone (fwd, and fwd+input-grad)
    def mags5(w):
        return tuple(L.stft_magnitude(w, *res) for res in cfg.resolutions)

    emit("mags5_fwd", *timeit(jax.jit(mags5), wav_slice))

    def mags5_loss(w):
        return sum(jnp.sum(m) for m in mags5(w))

    emit("mags5_vjp", *timeit(jax.jit(jax.grad(mags5_loss)), wav_slice))

    # the mel variant's extra loss branch at the same shapes, for comparison
    d = hps.data

    def mel_branch(w):
        mel = mel_spectrogram(w, d.filter_length, d.n_mel_channels,
                              d.sampling_rate, d.hop_length, d.win_length,
                              d.mel_fmin, d.mel_fmax)
        return jnp.mean(jnp.abs(mel))

    emit("mel_branch_grad", *timeit(jax.jit(jax.grad(mel_branch)), wav_slice))

    # optimizer updates on the real trees
    gz = jax.tree_util.tree_map(jnp.ones_like, state["gen"])
    f = jax.jit(lambda g, s, p: gen_opt.update(g, s, p, 2e-4))
    emit("opt_gen_adamw", *timeit(f, gz, state["gen_opt"], state["gen"]))
    dz = jax.tree_util.tree_map(jnp.ones_like, state["disc"])
    f = jax.jit(lambda g, s, p: disc_opt.update(g, s, p, 2e-4))
    emit("opt_disc_radam", *timeit(f, dz, state["disc_opt"], state["disc"]))


if __name__ == "__main__":
    main()
