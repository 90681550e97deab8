#!/usr/bin/env python3
"""Locate the train-step bottleneck on chip: MAS impls, forward, D-step, G-step."""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp


def t(fn, *a, iters=3):
    ck = jax.jit(lambda x: jnp.sum(jax.tree_util.tree_leaves(x)[0].astype(jnp.float32)))
    out = fn(*a)
    jax.device_get(ck(out))
    t0 = time.time()
    for _ in range(iters):
        out = fn(*a)
    jax.device_get(ck(out))
    return (time.time() - t0) / iters


def main():
    from vits_tpu.config import get_hparams_from_file, default_config_path
    from vits_tpu.models.synthesizer import Synthesizer
    from vits_tpu.ops import mas

    hps = get_hparams_from_file(default_config_path("base"))
    synth = Synthesizer.from_hps(hps)
    params = synth.init_params(jax.random.PRNGKey(0))

    B, T_x, T_y = 16, 96, 400
    rng = np.random.RandomState(0)
    res = {}

    neg = jnp.asarray(rng.randn(B, T_y, T_x), jnp.float32)
    mask = jnp.ones((B, T_y, T_x), jnp.float32)
    f_pal = jax.jit(lambda n, m: mas.maximum_path(n, m, impl="pallas"))
    f_scan = jax.jit(lambda n, m: mas.maximum_path(n, m, impl="scan"))
    res["mas_pallas_ms"] = round(t(f_pal, neg, mask) * 1e3, 2)
    res["mas_scan_ms"] = round(t(f_scan, neg, mask) * 1e3, 2)
    print(json.dumps(res))

    F = hps.data.filter_length // 2 + 1
    batch = dict(
        x=jnp.asarray(rng.randn(B, T_x, hps.data.text_channels), jnp.float32),
        x_lengths=jnp.asarray([T_x] * B, jnp.int32),
        spec=jnp.asarray(np.abs(rng.randn(B, T_y, F)), jnp.float32),
        spec_lengths=jnp.asarray([T_y] * B, jnp.int32),
        emo=jnp.asarray(rng.randn(B, 1024), jnp.float32),
        sid=jnp.asarray(rng.randint(0, hps.data.n_speakers, B), jnp.int32),
    )

    for impl in ("pallas", "scan"):
        fwd = jax.jit(lambda p, b, r: synth.forward(
            p, r, b["x"], b["x_lengths"], b["spec"], b["spec_lengths"],
            b["emo"], b["sid"], align_noise=0.01, mas_impl=impl, train=True))
        res[f"forward_{impl}_ms"] = round(
            t(lambda: fwd(params, batch, jax.random.PRNGKey(0))) * 1e3, 2)
        print(json.dumps(res))

    # forward + full generator grad (no discriminators) — isolates vjp cost
    def loss_fn(p, b, r):
        out = synth.forward(p, r, b["x"], b["x_lengths"], b["spec"],
                            b["spec_lengths"], b["emo"], b["sid"],
                            align_noise=0.01, mas_impl="pallas", train=True)
        return (jnp.mean(jnp.square(out["y_hat"])) + jnp.mean(out["l_length"]) +
                jnp.mean(jnp.square(out["z_q"])) + jnp.mean(jnp.square(out["logw"])))

    gfn = jax.jit(jax.grad(loss_fn))
    res["fwd_bwd_pallas_ms"] = round(
        t(lambda: gfn(params, batch, jax.random.PRNGKey(0))) * 1e3, 2)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
