#!/usr/bin/env python3
"""Which part of the stft/MRD train step is slow to compile on the TPU?

Compiles (and times compile of) each MRD sub-graph separately at base-config
shapes: multi-wave discriminator forward, multi-STFT discriminator forward,
5-resolution STFT magnitudes, and each with a grad. Prints one JSON line per
probe as it completes, so a partial run still tells us the culprit.
"""
import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
FRAMES = int(sys.argv[2]) if len(sys.argv) > 2 else 48  # segment frames
HOP = 192
T = FRAMES * HOP  # segment_size 9216 at base config


def probe(name, fn, *args):
    t0 = time.time()
    lowered = jax.jit(fn).lower(*args)
    t1 = time.time()
    compiled = lowered.compile()
    t2 = time.time()
    out = compiled(*args)
    jax.device_get(jax.tree_util.tree_map(lambda a: jnp.sum(a.astype(jnp.float32)), out))
    t3 = time.time()
    print(json.dumps({"probe": name, "trace_s": round(t1 - t0, 1),
                      "compile_s": round(t2 - t1, 1),
                      "first_run_s": round(t3 - t2, 1)}), flush=True)


def main():
    from vits_tpu.models.mrd import MultiWaveDiscriminator, MultiSTFTDiscriminator
    from vits_tpu.train import losses as L

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, T, 1).astype(np.float32) * 0.1)

    resolutions = L.DEFAULT_RESOLUTIONS
    mags_fn = lambda w: [L.stft_magnitude(w[..., 0], *r) for r in resolutions]
    probe("stft_mags_fwd", mags_fn, x)

    def mags_grad(w):
        ms = mags_fn(w)
        return sum(jnp.sum(m) for m in ms)
    probe("stft_mags_grad", jax.grad(mags_grad), x)

    mwd = MultiWaveDiscriminator()
    pw = mwd.init_params(jax.random.PRNGKey(0))
    probe("mwd_fwd", lambda p, x: mwd.apply(p, x), pw, x)
    probe("mwd_grad", jax.grad(lambda p, x: sum(jnp.sum(o) for o in mwd.apply(p, x))), pw, x)

    mfd = MultiSTFTDiscriminator()
    pf = mfd.init_params(jax.random.PRNGKey(1))
    mags = [np.asarray(m) for m in jax.jit(mags_fn)(x)]
    mags = [jnp.asarray(m) for m in mags]
    probe("mstft_fwd", lambda p, ms: mfd.apply(p, ms), pf, mags)
    probe("mstft_grad", jax.grad(
        lambda p, ms: sum(jnp.sum(o) for o in mfd.apply(p, ms))), pf, mags)


if __name__ == "__main__":
    main()
