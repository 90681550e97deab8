#!/usr/bin/env python3
"""Decompose the stft-variant train step into its sub-graphs and time each on
the real chip (the full step measured 642 s compile and >43 s/step at
batch 32x400 after the MRD phase-decompose, vs a 52 ms speed-of-light; the
MRD pieces alone are ~75 ms, so the cost is elsewhere).

Pieces (base config, batch 32, 400 frames):
  A fwd_vjp      generator forward + cotangent pullback incl. the 5-res
                 |STFT| of y_hat inside the vjp (what the stft step adds to
                 the mel step's shared forward)
  B mel_fwd_vjp  the same fwd/vjp WITHOUT the stft mags (mel-variant shape)
  C stft_mags    5-resolution stft_magnitude fwd + grad on the segment
  D d_step       MRD d_loss value_and_grad + RAdam update + sn_update
  E g_loss       G losses (stft + adversarial MRD pass) value_and_grad wrt
                 (y_hat, mags)
Each prints one JSON line as soon as it is measured.
"""
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from vits_tpu.config import get_hparams_from_file, default_config_path
from vits_tpu.train.loop import build_models, build_optimizers, init_state
from vits_tpu.train.step import TrainStepConfig, _DIFF_KEYS, _AUX_KEYS
from vits_tpu.train import losses as L
from vits_tpu.nn.core import sn_update
from vits_tpu.ops.seq import slice_segments_1d


def _tree_sum(t):
    return sum(jnp.sum(x.astype(jnp.float32)) for x in jax.tree_util.tree_leaves(t))


_CK = jax.jit(_tree_sum)


def timeit(fn, *args, iters=3):
    t0 = time.time()
    out = fn(*args)
    jax.device_get(_CK(out))
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.device_get(_CK(out))
    return (time.time() - t0) / iters, compile_s


def emit(name, dt, compile_s):
    print(json.dumps({"piece": name, "ms": round(dt * 1e3, 1),
                      "compile_s": round(compile_s, 1)}), flush=True)


def main():
    hps = get_hparams_from_file(default_config_path("base"))
    hps.adapt = False
    B, text_len, spec_frames = 32, 96, 400
    variant = "stft"
    synth, disc, _ = build_models(hps, variant, False)
    gen_opt, disc_opt, _ = build_optimizers(hps, variant, False)
    state = init_state(hps, synth, disc, None, gen_opt, disc_opt, None)
    cfg = TrainStepConfig.from_hps(hps, variant=variant,
                                   compute_dtype=jnp.bfloat16)
    cd = cfg.compute_dtype

    rng = np.random.RandomState(0)
    F = hps.data.filter_length // 2 + 1
    hop = hps.data.hop_length
    batch = {
        "x": jnp.asarray(rng.randn(B, text_len, hps.data.text_channels).astype(np.float32)),
        "x_lengths": jnp.asarray([text_len - (i % 7) for i in range(B)], jnp.int32),
        "spec": jnp.asarray(np.abs(rng.randn(B, spec_frames, F)).astype(np.float32)),
        "spec_lengths": jnp.asarray([spec_frames - 13 * (i % 4) for i in range(B)], jnp.int32),
        "wav": jnp.asarray(rng.uniform(-0.5, 0.5, (B, spec_frames * hop)).astype(np.float32)),
        "emo": jnp.asarray(rng.randn(B, 1024).astype(np.float32)),
        "sid": jnp.asarray(rng.randint(0, hps.data.n_speakers, B), jnp.int32),
    }
    rng_fwd = jax.random.PRNGKey(0)

    def cast_p(tree):
        return jax.tree_util.tree_map(
            lambda a: a.astype(cd) if a.dtype == jnp.float32 else a, tree)

    def make_fwd(with_mags):
        def fwd(gen_params):
            gp = cast_p(gen_params)
            out = synth.forward(
                gp, rng_fwd,
                batch["x"].astype(cd), batch["x_lengths"],
                batch["spec"].astype(cd), batch["spec_lengths"],
                batch["emo"].astype(cd), batch["sid"],
                align_noise=0.01, mas_impl=cfg.mas_impl, train=True)
            diff = {k: out[k] for k in _DIFF_KEYS}
            if with_mags:
                y_hat_f = out["y_hat"].astype(jnp.float32)[..., 0]
                diff["mags_fake"] = tuple(
                    L.stft_magnitude(y_hat_f, *res) for res in cfg.resolutions)
            aux = {k: out[k] for k in _AUX_KEYS}
            return diff, aux
        return fwd

    def fwd_vjp(gen_params, with_mags):
        diff, vjp_fn, aux = jax.vjp(make_fwd(with_mags), gen_params, has_aux=True)
        ct = jax.tree_util.tree_map(jnp.ones_like, diff)
        (g,) = vjp_fn(ct)
        return _tree_sum(g)

    # A/B: forward+backward with and without the in-vjp stft mags
    fa = jax.jit(lambda p: fwd_vjp(p, True))
    dt, cs = timeit(fa, state["gen"])
    emit("fwd_vjp_stft", dt, cs)
    fb = jax.jit(lambda p: fwd_vjp(p, False))
    dt, cs = timeit(fb, state["gen"])
    emit("fwd_vjp_plain", dt, cs)

    # real diff/aux for the loss pieces
    diff, aux = jax.jit(make_fwd(True))(state["gen"])
    ids = aux["ids_slice"]
    seg = cfg.segment_frames * cfg.hop_length
    y_slice = slice_segments_1d(batch["wav"], ids * cfg.hop_length, seg)[..., None]
    y_hat = jax.lax.stop_gradient(diff["y_hat"]).astype(jnp.float32)
    mags_fake = jax.lax.stop_gradient(diff["mags_fake"])
    mags_real = tuple(L.stft_magnitude(y_slice[..., 0], *res)
                      for res in cfg.resolutions)

    # C: 5-res |STFT| fwd+grad on the segment
    def mags_loss(w):
        return sum(jnp.sum(L.stft_magnitude(w, *res)) for res in cfg.resolutions)
    fc = jax.jit(jax.grad(mags_loss))
    dt, cs = timeit(fc, y_slice[..., 0])
    emit("stft_mags_grad", dt, cs)

    # D: full D sub-step (batched real+fake MRD, RAdam update, sn_update)
    mags_real_c = [m.astype(cd) for m in mags_real]
    mags_fake_c = [m.astype(cd) for m in mags_fake]
    y_slice_c = y_slice.astype(cd)
    y_hat_c = y_hat.astype(cd)

    def d_step(dp, dopt):
        def d_loss_fn(dp):
            both = disc.apply(
                cast_p(dp),
                jnp.concatenate([y_slice_c, y_hat_c], axis=0),
                [jnp.concatenate([mr, mf], axis=0)
                 for mr, mf in zip(mags_real_c, mags_fake_c)])
            y_d_r = [s[:B] for s in both]
            y_d_g = [s[B:] for s in both]
            loss, _, _ = L.discriminator_loss(y_d_r, y_d_g)
            return loss
        loss, grads = jax.value_and_grad(d_loss_fn)(dp)
        upd, dopt = disc_opt.update(grads, dopt, dp, 2e-4)
        new_dp = jax.tree_util.tree_map(lambda p, u: p + u, dp, upd)
        return sn_update(new_dp), loss
    fd = jax.jit(d_step)
    dt, cs = timeit(fd, state["disc"], state["disc_opt"])
    emit("d_step", dt, cs)

    # D2: sn_update alone
    fd2 = jax.jit(sn_update)
    dt, cs = timeit(fd2, state["disc"])
    emit("sn_update", dt, cs)

    # E: G losses (stft + adversarial) grad wrt (y_hat, mags)
    def g_loss(y_hat_g, mags_fake):
        sc, mag = L.multi_resolution_stft_losses(mags_real, mags_fake)
        loss_stft = (sc + mag) * cfg.c_stft
        y_d_g = disc.apply(cast_p(state["disc"]), y_hat_g.astype(cd),
                           [m.astype(cd) for m in mags_fake])
        loss_gen, _ = L.generator_loss(y_d_g)
        return loss_gen + loss_stft
    fe = jax.jit(jax.grad(g_loss, argnums=(0, 1)))
    dt, cs = timeit(fe, y_hat, mags_fake)
    emit("g_loss_grad", dt, cs)


if __name__ == "__main__":
    main()
