#!/usr/bin/env python3
"""Per-stage timing of the REAL decoder graph (Generator.apply stages=n) in
bf16 AND int8, plus p1/flow — the committed per-stage breakdown VERDICT r3
task 1 asks for. Differences between consecutive prefixes = per-stage cost.

Usage: python scripts/profile_infer2.py [bf16|int8|both]
"""

import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from vits_tpu.config import get_hparams_from_file, default_config_path
from vits_tpu.models.synthesizer import Synthesizer
from vits_tpu.nn.core import fold_weight_norm
from vits_tpu.ops.seq import infer_path

DT = jnp.bfloat16


def timeit(fn, iters=20):
    ck = jax.jit(lambda t: jnp.sum(t.astype(jnp.float32)))
    out = fn()
    jax.device_get(ck(out))
    t0 = time.time()
    for _ in range(iters):
        out = fn()
    jax.device_get(ck(out))
    return (time.time() - t0) / iters * 1e3


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    hps = get_hparams_from_file(default_config_path("base"))
    synth = Synthesizer.from_hps(hps)
    params = fold_weight_norm(synth.init_params(jax.random.PRNGKey(0)))
    cast = lambda t: jax.tree_util.tree_map(
        lambda a: a.astype(DT) if a.dtype == jnp.float32 else a, t)
    params = cast(params)

    B, T_x, T_y = 8, 96, 768
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, T_x, hps.data.text_channels), DT)
    emo = jnp.asarray(rng.randn(B, 1024), DT)
    noise = jnp.asarray(rng.randn(B, T_y, hps.model.inter_channels) * hps.data.noise_scale, DT)
    sid = jnp.asarray(rng.randint(0, hps.data.n_speakers, B), jnp.int32)
    attn = infer_path(jnp.full((B, T_x), T_y // T_x, jnp.float32), T_y).astype(DT)

    p1 = jax.jit(lambda p, x, e, s: synth.infer_p1(p, x, e, s))
    m_p, s_p, logw, g = p1(params, x, emo, sid)

    def expand_flow(p, a, m, s, g, n):
        m_e = jnp.einsum("byx,bxc->byc", a, m)
        s_e = jnp.einsum("byx,bxc->byc", a, s)
        return synth.flow.apply(p["flow"], m_e + n * s_e, None, g=g, reverse=True)

    ef = jax.jit(expand_flow)
    z = ef(params, attn, m_p, s_p, g, noise)

    res = {}
    res["p1_ms"] = round(timeit(lambda: p1(params, x, emo, sid)[0]), 3)
    res["expand_flow_ms"] = round(timeit(lambda: ef(params, attn, m_p, s_p, g, noise)), 3)

    dec = synth.dec
    nstages = dec.num_upsamples

    def profile_path(tag, dparams, q8):
        full = jax.jit(lambda p, z, g: dec.apply(p, z, g=g, q8=q8))
        res[f"decoder_{tag}_ms"] = round(timeit(lambda: full(dparams, z, g)), 3)
        prev = 0.0
        for n in range(1, nstages + 1):
            f = jax.jit(lambda p, z, g, n=n: dec.apply(p, z, g=g, q8=q8, stages=n))
            t = timeit(lambda: f(dparams, z, g))
            res[f"{tag}_prefix{n}_ms"] = round(t, 3)
            res[f"{tag}_stage{n-1}_ms"] = round(t - prev, 3)
            prev = t

    if which in ("bf16", "both"):
        profile_path("bf16", params["dec"], q8=False)
    if which in ("int8", "both"):
        dec_q8 = synth.quantize_decoder(params, z, g)
        profile_path("int8", dec_q8, q8=True)

    print(json.dumps(res))


if __name__ == "__main__":
    main()
