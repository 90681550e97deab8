#!/usr/bin/env python3
"""Per-op decoder timings with dispatch overhead amortized: each measurement
runs N sequential ops inside ONE jit via lax.fori_loop (loop-carried value,
so XLA cannot fuse or CSE the iterations), then divides by N.

Rooflines at (8,36864,128) bf16, v5e (819 GB/s, 197 TF/s bf16, 394 TOP/s s8):
  traversal (151 MB)        0.18 ms
  conv k3 compute           0.15 ms   conv k7: 0.35   conv k11: 0.54
"""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

_DN1 = ("NWC", "WIO", "NWC")
N = 32


def timed(fn, x, iters=5):
    ck = jax.jit(lambda t: jnp.sum(t.astype(jnp.float32)))
    out = fn(x)
    jax.device_get(ck(out))
    t0 = time.time()
    for _ in range(iters):
        out = fn(x)
    jax.device_get(ck(out))
    return (time.time() - t0) / iters / N * 1e3  # ms per single op


def loop(body):
    return jax.jit(lambda x: lax.fori_loop(0, N, body, x))


def main():
    rng = np.random.RandomState(0)
    res = {}
    B, T, C = 8, 36864, 128
    x = jnp.asarray(rng.randn(B, T, C), jnp.bfloat16)
    x8 = jnp.asarray(rng.randint(-16, 16, (B, T, C)), jnp.int8)

    for k, d in [(1, 1), (3, 1), (11, 1), (11, 5)]:
        w = jnp.asarray(rng.randn(k, C, C) * (0.5 / (k * C) ** 0.5), jnp.bfloat16)
        pad = (k * d - d) // 2
        res[f"conv_bf16_k{k}_d{d}_ms"] = timed(
            loop(lambda i, a, w=w, d=d, pad=pad: lax.conv_general_dilated(
                a, w, (1,), [(pad, pad)], rhs_dilation=(d,),
                dimension_numbers=_DN1)), x)

    for k in [3, 11]:
        w8 = jnp.asarray(rng.randint(-127, 127, (k, C, C)), jnp.int8)
        pad = k // 2

        def body8(i, a, w8=w8, pad=pad):
            y = lax.conv_general_dilated(
                a, w8, (1,), [(pad, pad)], dimension_numbers=_DN1,
                preferred_element_type=jnp.int32)
            return jnp.clip(jnp.round(y.astype(jnp.float32) * 1e-4),
                            -127, 127).astype(jnp.int8)
        res[f"conv_int8_k{k}_ms"] = timed(loop(body8), x8)

    # conv k3 + GLU gate epilogue (bf16): epilogue-fusion check
    w3 = jnp.asarray(rng.randn(3, C, C) * 0.03, jnp.bfloat16)
    gs = jnp.asarray(rng.randn(C), jnp.bfloat16)

    def body_gate(i, a):
        y = lax.conv_general_dilated(a, w3, (1,), [(1, 1)], dimension_numbers=_DN1)
        h = C // 2
        g = jnp.tanh(y[..., :h] + gs[None, None, :h]) * jax.nn.sigmoid(
            y[..., h:] + gs[None, None, h:])
        return jnp.concatenate([g, g], axis=-1)  # keep carry shape
    res["conv_gate_bf16_k3_ms"] = timed(loop(body_gate), x)

    # matmuls at conv-k1 arithmetic
    wm = jnp.asarray(rng.randn(C, C) * 0.05, jnp.bfloat16)
    res["matmul_bf16_ms"] = timed(loop(lambda i, a: a @ wm), x)
    wm8 = jnp.asarray(rng.randint(-127, 127, (C, C)), jnp.int8)

    def body_mm8(i, a):
        y = lax.dot_general(a, wm8, (((2,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
        return jnp.clip(jnp.round(y.astype(jnp.float32) * 1e-4),
                        -127, 127).astype(jnp.int8)
    res["matmul_int8_ms"] = timed(loop(body_mm8), x8)

    for k, v in res.items():
        res[k] = round(v, 4)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
