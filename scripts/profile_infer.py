#!/usr/bin/env python3
"""Per-component timing of the two-phase inference path on the real chip.

SUPERSEDED for per-stage work by scripts/profile_infer2.py, which times
prefixes of the REAL Generator.apply graph (stages=n) in bf16 AND int8
instead of this file's hand-copied stage loop; kept for the p1/p2/expand
split and the ups-only leg.

Times (bf16, weight-norm-folded, B=8, T_y=768 — the bench.py config):
  p1, p2, expand+flow, full decoder, and decoder prefixes through each
  upsample stage (differences = per-stage cost).

Timing goes through a jitted scalar checksum + jax.device_get (relay-safe,
see CLAUDE.md).
"""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from vits_tpu.config import get_hparams_from_file, default_config_path
from vits_tpu.models.synthesizer import Synthesizer
from vits_tpu.nn.core import Conv1d, fold_weight_norm, leaky_relu
from vits_tpu.nn.packed import conv1d_packed, conv_transpose1d_packed, mask_packed, repack, unpack
from vits_tpu.models.modules import LRELU_SLOPE
from vits_tpu.ops.seq import infer_path

DT = jnp.bfloat16


def timeit(fn, *args, iters=20):
    ck = jax.jit(lambda t: jnp.sum(t.astype(jnp.float32)))
    out = fn(*args)
    jax.device_get(ck(out))
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.device_get(ck(out))
    return (time.time() - t0) / iters


def main():
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

    p2 = jax.jit(lambda p, a, m, s, g, n: synth.infer_p2(p, a, m, s, g, n))

    def expand_flow(p, a, m, s, g, n):
        m_e = jnp.einsum("byx,bxc->byc", a, m)
        s_e = jnp.einsum("byx,bxc->byc", a, s)
        z_p = m_e + n * s_e
        return synth.flow.apply(p["flow"], z_p, None, g=g, reverse=True)

    ef = jax.jit(expand_flow)
    z = ef(params, attn, m_p, s_p, g, noise)

    dec = synth.dec
    packs = dec._pack_schedule()

    def dec_prefix(p, x, g, n_stages):
        x = Conv1d(dec.initial_channel, dec.upsample_initial_channel, 7, padding=3).apply(p["conv_pre"], x)
        p_cur = 1
        for i in range(n_stages):
            x = leaky_relu(x, LRELU_SLOPE)
            p_i = packs[i]
            u, k = dec.upsample_rates[i], dec.upsample_kernel_sizes[i]
            if p_cur > 1 or p_i > 1:
                x = conv_transpose1d_packed(dec._up(i), p["ups"][str(i)], x, p_cur)
                x = repack(x, p_cur * u, p_i)
            else:
                x = dec._up(i).apply(p["ups"][str(i)], x)
            p_cur = p_i
            xs = 0.0
            for j in range(dec.num_kernels):
                idx = i * dec.num_kernels + j
                rb = dec._resblock(i, j)
                if p_cur > 1:
                    xs = xs + rb.apply_packed(p["resblocks"][str(idx)], x, g, p_cur)
                else:
                    xs = xs + rb.apply(p["resblocks"][str(idx)], x, g)
            x = xs / dec.num_kernels
        return x

    def dec_ups_only(p, x, g):
        x = Conv1d(dec.initial_channel, dec.upsample_initial_channel, 7, padding=3).apply(p["conv_pre"], x)
        p_cur = 1
        for i in range(dec.num_upsamples):
            x = leaky_relu(x, LRELU_SLOPE)
            p_i = packs[i]
            u = dec.upsample_rates[i]
            if p_cur > 1 or p_i > 1:
                x = conv_transpose1d_packed(dec._up(i), p["ups"][str(i)], x, p_cur)
                x = repack(x, p_cur * u, p_i)
            else:
                x = dec._up(i).apply(p["ups"][str(i)], x)
            p_cur = p_i
        return x

    res = {}
    res["p1_ms"] = timeit(lambda: p1(params, x, emo, sid).__getitem__(0)) * 1e3
    res["p2_ms"] = timeit(lambda: p2(params, attn, m_p, s_p, g, noise)) * 1e3
    res["expand_flow_ms"] = timeit(lambda: ef(params, attn, m_p, s_p, g, noise)) * 1e3
    full_dec = jax.jit(lambda p, z, g: dec.apply(p["dec"], z, g=g))
    res["decoder_ms"] = timeit(lambda: full_dec(params, z, g)) * 1e3
    prev = 0.0
    for n in range(1, dec.num_upsamples + 1):
        f = jax.jit(lambda p, z, g, n=n: dec_prefix(p["dec"], z, g, n))
        t = timeit(lambda: f(params, z, g)) * 1e3
        res[f"dec_prefix{n}_ms"] = round(t, 3)
        res[f"stage{n - 1}_ms"] = round(t - prev, 3)
        prev = t
    f = jax.jit(lambda p, z, g: dec_ups_only(p["dec"], z, g))
    res["ups_only_ms"] = timeit(lambda: f(params, z, g)) * 1e3
    for k, v in res.items():
        res[k] = round(v, 3)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
