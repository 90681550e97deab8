#!/usr/bin/env python3
"""Probe the attached TPU: device kind, practical bf16/int8 matmul peak, and
int8 vs bf16 packed-conv throughput at the decoder's stage-3 shape."""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def t(fn, *a, iters=10):
    ck = jax.jit(lambda x: jnp.sum(x.astype(jnp.float32)))
    out = fn(*a)
    jax.device_get(ck(out))
    t0 = time.time()
    for _ in range(iters):
        out = fn(*a)
    jax.device_get(ck(out))
    return (time.time() - t0) / iters


def main():
    d = jax.devices()[0]
    res = {"device_kind": d.device_kind, "platform": d.platform}

    # bf16 matmul peak: 8192^3
    n = 8192
    a = jnp.asarray(np.random.randn(n, n), jnp.bfloat16)
    b = jnp.asarray(np.random.randn(n, n), jnp.bfloat16)
    mm = jax.jit(lambda a, b: a @ b)
    dt = t(mm, a, b)
    res["bf16_matmul_tflops"] = round(2 * n**3 / dt / 1e12, 1)

    # int8 matmul peak
    ai = jnp.asarray(np.random.randint(-127, 127, (n, n)), jnp.int8)
    bi = jnp.asarray(np.random.randint(-127, 127, (n, n)), jnp.int8)
    mmi = jax.jit(lambda a, b: lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32))
    dt = t(mmi, ai, bi)
    res["int8_matmul_tops"] = round(2 * n**3 / dt / 1e12, 1)

    # packed stage-3 conv shape: (8, 36864, 128) x (15, 128, 128) taps
    B, M, C, A = 8, 36864, 128, 15
    x = jnp.asarray(np.random.randn(B, M, C), jnp.bfloat16)
    w = jnp.asarray(np.random.randn(A, C, C) * 0.05, jnp.bfloat16)
    conv = jax.jit(lambda x, w: lax.conv_general_dilated(
        x, w, (1,), [(7, 7)], dimension_numbers=("NWC", "WIO", "NWC")))
    dt = t(conv, x, w)
    res["bf16_conv_tflops"] = round(2 * B * M * A * C * C / dt / 1e12, 1)

    xi = jnp.asarray(np.random.randint(-127, 127, (B, M, C)), jnp.int8)
    wi = jnp.asarray(np.random.randint(-127, 127, (A, C, C)), jnp.int8)
    convi = jax.jit(lambda x, w: lax.conv_general_dilated(
        x, w, (1,), [(7, 7)], dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.int32))
    try:
        dt = t(convi, xi, wi)
        res["int8_conv_tops"] = round(2 * B * M * A * C * C / dt / 1e12, 1)
    except Exception as e:  # noqa
        res["int8_conv_tops"] = f"error: {type(e).__name__}"

    # int8 conv with fused dequant epilogue (realistic serving op)
    sc = jnp.asarray(np.random.rand(C), jnp.float32)
    convdq = jax.jit(lambda x, w: (lax.conv_general_dilated(
        x, w, (1,), [(7, 7)], dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.int32).astype(jnp.float32) * sc).astype(jnp.bfloat16))
    try:
        dt = t(convdq, xi, wi)
        res["int8_conv_dequant_tops"] = round(2 * B * M * A * C * C / dt / 1e12, 1)
    except Exception as e:  # noqa
        res["int8_conv_dequant_tops"] = f"error: {type(e).__name__}"

    # HBM bandwidth: big copy
    big = jnp.asarray(np.random.randn(512, 1024, 128), jnp.bfloat16)  # 128 MB
    cp = jax.jit(lambda x: x * 1.0000001)
    dt = t(cp, big)
    res["hbm_gbps_rw"] = round(2 * big.size * 2 / dt / 1e9, 0)

    print(json.dumps(res))


if __name__ == "__main__":
    main()
