#!/usr/bin/env python3
"""Steady-state per-piece timing of the MRD discriminator on the real chip:
the stft train step measured 216 s/step (bench_train 32 400 stft) vs a 52 ms
speed-of-light — this narrows which op class is degenerate on the TPU."""
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from vits_tpu.config import get_hparams_from_file, default_config_path
from vits_tpu.models.mrd import (MultiWaveSTFTDiscriminator, WaveDiscriminator,
                                 STFTDiscriminator)
from vits_tpu.train import losses as L


def timeit(fn, *args, iters=5):
    ck = jax.jit(lambda t: jnp.sum(sum(jnp.sum(x) for x in t) if isinstance(t, (list, tuple)) else t).astype(jnp.float32))
    out = fn(*args)
    jax.device_get(ck(out))
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.device_get(ck(out))
    return (time.time() - t0) / iters


def main():
    hps = get_hparams_from_file(default_config_path("base"))
    B = 32
    seg = hps.train.segment_size  # samples
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.uniform(-0.5, 0.5, (B, seg, 1)).astype(np.float32))
    res = {"seg_samples": seg}

    # lone dilated VALID conv at the WaveDiscriminator shape
    for dil in (1, 4, 9):
        w = jnp.asarray(rng.randn(5, 64, 64).astype(np.float32) * 0.01)
        xc = jnp.asarray(rng.randn(B, seg, 64).astype(np.float32))
        f = jax.jit(lambda x, w, d=dil: jax.lax.conv_general_dilated(
            x, w, (1,), "VALID", rhs_dilation=(d,),
            dimension_numbers=("NWC", "WIO", "NWC")))
        dt = timeit(f, xc, w)
        gf = 2 * B * (seg - 4 * dil) * 5 * 64 * 64 / 1e9
        res[f"conv64_d{dil}_ms"] = round(dt * 1e3, 2)
        res[f"conv64_d{dil}_tflops"] = round(gf / dt / 1e3, 3)

    # one full WaveDiscriminator (level 0): 10 layers dil 2..9
    wd = WaveDiscriminator(1, 5, 10, 64, use_weight_norm=False)
    pw = wd.init_params(jax.random.PRNGKey(0))
    f = jax.jit(wd.apply)
    res["wave_disc0_ms"] = round(timeit(f, pw, x) * 1e3, 2)

    # same disc but weight-norm (no spectral-norm graph) — isolates sn cost
    wd_wn = WaveDiscriminator(1, 5, 10, 64, use_weight_norm=True)
    pw_wn = wd_wn.init_params(jax.random.PRNGKey(0))
    f = jax.jit(wd_wn.apply)
    res["wave_disc0_wn_ms"] = round(timeit(f, pw_wn, x) * 1e3, 2)

    # one STFTDiscriminator at the largest resolution
    sd = STFTDiscriminator(2048, 512, 2048, 9, 5, conv_channels=64)
    ps = sd.init_params(jax.random.PRNGKey(1))
    mag = jnp.asarray(np.abs(rng.randn(B, seg // 512 + 1, 1025)).astype(np.float32))
    f = jax.jit(sd.apply)
    res["stft_disc2048_ms"] = round(timeit(f, ps, mag) * 1e3, 2)

    # full MRD fwd
    mrd = MultiWaveSTFTDiscriminator()
    pm = mrd.init_params(jax.random.PRNGKey(2))
    mags = [jnp.asarray(np.abs(rng.randn(B, seg // h + 1, n // 2 + 1)).astype(np.float32))
            for (n, h, w) in L.DEFAULT_RESOLUTIONS]
    f = jax.jit(lambda p, x, m: [jnp.sum(s) for s in mrd.apply(p, x, m)])
    res["mrd_fwd_ms"] = round(timeit(f, pm, x, mags) * 1e3, 2)

    # MRD fwd+bwd (the D-step shape)
    def d_loss(p, x, mags):
        scores = mrd.apply(p, x, mags)
        return sum(jnp.sum(jnp.square(s)) for s in scores)
    f = jax.jit(jax.grad(d_loss))
    res["mrd_grad_ms"] = round(timeit(f, pm, x, mags) * 1e3, 2)

    print(json.dumps(res))


if __name__ == "__main__":
    main()
