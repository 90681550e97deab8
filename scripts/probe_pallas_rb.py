#!/usr/bin/env python3
"""Race the fused Pallas int8 ResBlock2 chain against the XLA apply_q8 path
(VERDICT r4 task 3) — per stage and full-decoder — at the bench operating
point (B=8, T_y=768, base config, bf16 residual stream).

Gate rule (CLAUDE.md): per-stage on-chip measurement BEFORE shipping; the
loser is recorded in BASELINE.md. Prints one JSON line per measurement.
"""

import json
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

DT = jnp.bfloat16


def _tree_sum(t):
    return sum(jnp.sum(x.astype(jnp.float32)) for x in jax.tree_util.tree_leaves(t))


_CK = jax.jit(_tree_sum)


def timeit(fn, *args, iters=20):
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


def emit(name, dt, compile_s, **kw):
    print(json.dumps({"piece": name, "ms": round(dt * 1e3, 2),
                      "compile_s": round(compile_s, 1), **kw}), flush=True)


def main():
    import sys
    chunk = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    # the kernel reads its (static) chunk length from this env var at trace
    # time (resblock2_chain_q8 default 1024) — set it BEFORE any jit, or the
    # CLI argument is a label only
    os.environ["VITS_TPU_RB_CHUNK"] = str(chunk)
    from vits_tpu.config import get_hparams_from_file, default_config_path
    from vits_tpu.models.synthesizer import Synthesizer
    from vits_tpu.nn.core import fold_weight_norm
    from vits_tpu.ops.seq import infer_path
    import vits_tpu.nn.pallas_rb as PRB

    hps = get_hparams_from_file(default_config_path("base"))
    synth = Synthesizer.from_hps(hps)
    params32 = fold_weight_norm(synth.init_params(jax.random.PRNGKey(0)))
    cast = lambda t: jax.tree_util.tree_map(
        lambda a: a.astype(DT) if a.dtype == jnp.float32 else a, t)
    params = cast(params32)

    B, T_x, T_y = 8, 96, 768
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, T_x, hps.data.text_channels), DT)
    emo = jnp.asarray(rng.randn(B, 1024), DT)
    sid = jnp.asarray(rng.randint(0, hps.data.n_speakers, B), jnp.int32)
    noise = jnp.asarray(rng.randn(B, T_y, hps.model.inter_channels)
                        * hps.data.noise_scale, DT)
    attn = jnp.asarray(infer_path(
        jnp.full((B, T_x), T_y // T_x, jnp.float32), T_y), DT)
    m_p, s_p, logw, g = jax.jit(synth.infer_p1)(params, x, emo, sid)
    z = jax.jit(lambda p, a, m, s, gg, n: synth.flow.apply(
        p["flow"], jnp.einsum("byx,bxc->byc", a, m) + n * jnp.einsum(
            "byx,bxc->byc", a, s), None, g=gg, reverse=True))(
        params, attn, m_p, s_p, g, noise)
    dec_q8 = synth.quantize_decoder(params, z, g)

    dec = synth.dec

    # full decoder: XLA int8 vs Pallas-resblock int8
    f_xla = jax.jit(lambda q, z, g: dec.apply(q, z, g=g, q8=True))
    emit("decoder_q8_xla", *timeit(f_xla, dec_q8, z, g))
    f_pl = jax.jit(lambda q, z, g: dec.apply(q, z, g=g, q8=True,
                                             q8_pallas=True))
    emit("decoder_q8_pallas", *timeit(f_pl, dec_q8, z, g), chunk=chunk)

    # equality gate at the operating point
    a = np.asarray(f_xla(dec_q8, z, g), np.float32).ravel()
    b = np.asarray(f_pl(dec_q8, z, g), np.float32).ravel()
    corr = float(a @ b / max(np.linalg.norm(a) * np.linalg.norm(b), 1e-9))
    print(json.dumps({"piece": "corr_xla_vs_pallas", "corr": round(corr, 6)}),
          flush=True)

    # per-stage prefixes (stages=n runs the first n upsample stages)
    for n in (1, 2, 3, 4):
        f = jax.jit(lambda q, z, g, n=n: dec.apply(q, z, g=g, q8=True,
                                                   stages=n))
        emit(f"stages{n}_xla", *timeit(f, dec_q8, z, g))
        f = jax.jit(lambda q, z, g, n=n: dec.apply(q, z, g=g, q8=True,
                                                   stages=n, q8_pallas=True))
        emit(f"stages{n}_pallas", *timeit(f, dec_q8, z, g))


if __name__ == "__main__":
    main()
