#!/usr/bin/env python3
"""Steady-state per-piece timing of the MRD discriminator on the real chip:
the stft train step measured 216 s/step (bench_train 32 400 stft) vs a 52 ms
speed-of-light — this narrows which op class is degenerate on the TPU.
Prints one JSON line PER PIECE as soon as it is measured."""
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from vits_tpu.config import get_hparams_from_file, default_config_path
from vits_tpu.models.mrd import (MultiWaveSTFTDiscriminator, WaveDiscriminator,
                                 STFTDiscriminator, dilated_valid_conv_phased)
from vits_tpu.train import losses as L


def _tree_sum(t):
    leaves = jax.tree_util.tree_leaves(t)
    return sum(jnp.sum(x.astype(jnp.float32)) for x in leaves)


_CK = jax.jit(_tree_sum)


def timeit(fn, *args, iters=3):
    out = fn(*args)
    jax.device_get(_CK(out))
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.device_get(_CK(out))
    return (time.time() - t0) / iters


def emit(name, dt, gflop=None):
    row = {"piece": name, "ms": round(dt * 1e3, 2)}
    if gflop:
        row["tflops"] = round(gflop / dt / 1e3, 3)
    print(json.dumps(row), flush=True)


def main():
    hps = get_hparams_from_file(default_config_path("base"))
    B = 32
    seg = hps.train.segment_size  # samples (9216 at base config)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.uniform(-0.5, 0.5, (B, seg, 1)).astype(np.float32))
    print(json.dumps({"seg_samples": seg}), flush=True)

    # lone conv at the WaveDiscriminator shape: direct dilated vs phased
    from vits_tpu.nn.core import Conv1d
    xc = jnp.asarray(rng.randn(B, seg, 64).astype(np.float32))
    for dil in (1, 4, 9):
        conv = Conv1d(64, 64, 5, padding="VALID", dilation=dil)
        p = conv.init_params(jax.random.PRNGKey(dil))
        gf = 2 * B * (seg - 4 * dil) * 5 * 64 * 64 / 1e9
        f = jax.jit(conv.apply)
        emit(f"conv64_direct_d{dil}", timeit(f, p, xc), gf)
        if dil > 1:
            f = jax.jit(lambda p, x, c=conv: dilated_valid_conv_phased(c, p, x))
            emit(f"conv64_phased_d{dil}", timeit(f, p, xc), gf)

    # one full WaveDiscriminator (level 0), spectral-norm params (default)
    wd = WaveDiscriminator(1, 5, 10, 64, use_weight_norm=False)
    pw = wd.init_params(jax.random.PRNGKey(0))
    emit("wave_disc0", timeit(jax.jit(wd.apply), pw, x))

    # one STFTDiscriminator at the largest resolution
    sd = STFTDiscriminator(2048, 512, 2048, 9, 5, conv_channels=64)
    ps = sd.init_params(jax.random.PRNGKey(1))
    mag = jnp.asarray(np.abs(rng.randn(B, seg // 512 + 1, 1025)).astype(np.float32))
    emit("stft_disc2048", timeit(jax.jit(sd.apply), ps, mag))

    # full MRD fwd and fwd+bwd (the D-step shape)
    mrd = MultiWaveSTFTDiscriminator()
    pm = mrd.init_params(jax.random.PRNGKey(2))
    mags = [jnp.asarray(np.abs(rng.randn(B, seg // h + 1, n // 2 + 1)).astype(np.float32))
            for (n, h, w) in L.DEFAULT_RESOLUTIONS]
    f = jax.jit(lambda p, x, m: [jnp.sum(s) for s in mrd.apply(p, x, m)])
    emit("mrd_fwd", timeit(f, pm, x, mags))

    def d_loss(p, x, mags):
        scores = mrd.apply(p, x, mags)
        return sum(jnp.sum(jnp.square(s)) for s in scores)
    emit("mrd_grad", timeit(jax.jit(jax.grad(d_loss)), pm, x, mags))


if __name__ == "__main__":
    main()
