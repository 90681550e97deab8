#!/usr/bin/env python3
"""Chip probe v2: amortize relay dispatch by looping ops inside one jit
(lax.scan), so sub-millisecond ops measure true device time."""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

INNER = 50


def t_scan(make_step, x0, iters=3):
    """Time INNER applications of make_step inside one jitted scan."""
    @jax.jit
    def run(x):
        def body(c, _):
            return make_step(c), None
        y, _ = lax.scan(body, x, None, length=INNER)
        return jnp.sum(y.astype(jnp.float32))

    jax.device_get(run(x0))
    t0 = time.time()
    for _ in range(iters):
        out = run(x0)
    jax.device_get(out)
    return (time.time() - t0) / iters / INNER


def main():
    res = {"device_kind": jax.devices()[0].device_kind}

    # HBM bandwidth: elementwise on 128 MB
    big = jnp.asarray(np.random.randn(512, 1024, 128), jnp.bfloat16)
    dt = t_scan(lambda x: x * 1.0000001 + 1e-9, big)
    res["hbm_gbps_rw"] = round(2 * big.size * 2 / dt / 1e9, 0)

    # bf16 conv at packed stage-3 shape (A=15 taps, 128ch)
    B, M, C, A = 8, 36864, 128, 15
    w = jnp.asarray(np.random.randn(A, C, C) * 0.02, jnp.bfloat16)
    x = jnp.asarray(np.random.randn(B, M, C), jnp.bfloat16)
    conv = lambda x: lax.conv_general_dilated(
        x, w, (1,), [(7, 7)], dimension_numbers=("NWC", "WIO", "NWC"))
    dt = t_scan(lambda x: jnp.tanh(conv(x)), x)
    res["bf16_conv_a15_tflops"] = round(2 * B * M * A * C * C / dt / 1e12, 1)

    # bf16 conv small taps (A=3) — stage-3 k=3 d=1 shape
    w3 = jnp.asarray(np.random.randn(3, C, C) * 0.05, jnp.bfloat16)
    conv3 = lambda x: lax.conv_general_dilated(
        x, w3, (1,), [(1, 1)], dimension_numbers=("NWC", "WIO", "NWC"))
    dt = t_scan(lambda x: jnp.tanh(conv3(x)), x)
    res["bf16_conv_a3_tflops"] = round(2 * B * M * 3 * C * C / dt / 1e12, 1)

    # int8 "conv" as explicit tap matmuls (shift + dot), dequant epilogue
    xi = jnp.asarray(np.random.randint(-8, 8, (B, M, C)), jnp.int8)
    wi = jnp.asarray(np.random.randint(-127, 127, (A, C, C)), jnp.int8)
    sc = jnp.float32(1e-4)

    def int8_tapmm(x):
        # x int8 (B,M,C) -> accumulate A shifted matmuls in int32
        acc = jnp.zeros((B, M, C), jnp.int32)
        for a in range(A):
            off = a - 7
            xs = jnp.roll(x, -off, axis=1)
            acc = acc + lax.dot_general(xs, wi[a], (((2,), (0,)), ((), ())),
                                        preferred_element_type=jnp.int32)
        y = (acc.astype(jnp.float32) * sc)
        return jnp.clip(jnp.round(y * 127.0), -127, 127).astype(jnp.int8)

    dt = t_scan(int8_tapmm, xi)
    res["int8_tapmm_tops"] = round(2 * B * M * A * C * C / dt / 1e12, 1)

    # same structure in bf16 for apples-to-apples
    wb = w

    def bf16_tapmm(x):
        acc = jnp.zeros((B, M, C), jnp.float32)
        for a in range(A):
            off = a - 7
            xs = jnp.roll(x, -off, axis=1)
            acc = acc + lax.dot_general(xs, wb[a], (((2,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)
        return jnp.tanh(acc).astype(jnp.bfloat16)

    dt = t_scan(bf16_tapmm, x)
    res["bf16_tapmm_tflops"] = round(2 * B * M * A * C * C / dt / 1e12, 1)

    # int8 via lax conv (for completeness, with scan timing)
    convi = lambda x: lax.conv_general_dilated(
        x, wi, (1,), [(7, 7)], dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.int32)

    def int8_conv_step(x):
        y = convi(x).astype(jnp.float32) * sc
        return jnp.clip(jnp.round(y * 127.0), -127, 127).astype(jnp.int8)

    dt = t_scan(int8_conv_step, xi)
    res["int8_conv_tops"] = round(2 * B * M * A * C * C / dt / 1e12, 1)

    # mixed: int8 weights, bf16 activations (weight-only quant)
    def w8a16(x):
        y = lax.conv_general_dilated(
            x, wi.astype(jnp.bfloat16), (1,), [(7, 7)],
            dimension_numbers=("NWC", "WIO", "NWC"))
        return jnp.tanh(y * sc).astype(jnp.bfloat16)

    dt = t_scan(w8a16, x)
    res["w8a16_conv_tflops"] = round(2 * B * M * A * C * C / dt / 1e12, 1)

    print(json.dumps(res))


if __name__ == "__main__":
    main()
