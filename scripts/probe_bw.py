#!/usr/bin/env python3
"""Disambiguate per-op overhead vs achievable HBM bandwidth: time a k=1 conv
(pure traversal + tiny matmul) at 0.5x/1x/2x sizes inside a fori_loop. If
time scales linearly with size -> bandwidth-bound (slope = 2*bytes/BW); a
constant offset = per-op floor. Plus one big square matmul for the real
achievable bf16 TFLOP/s."""

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
    return (time.time() - t0) / iters / N * 1e3


def main():
    rng = np.random.RandomState(0)
    res = {}
    C = 128
    w = jnp.asarray(rng.randn(1, C, C) * 0.05, jnp.bfloat16)
    for tag, T in [("half", 18432), ("one", 36864), ("two", 73728)]:
        x = jnp.asarray(rng.randn(8, T, C), jnp.bfloat16)
        fn = jax.jit(lambda x: lax.fori_loop(
            0, N, lambda i, a: lax.conv_general_dilated(
                a, w, (1,), [(0, 0)], dimension_numbers=_DN1), x))
        res[f"conv_k1_{tag}_ms"] = round(timed(fn, x), 4)
        res[f"conv_k1_{tag}_mb"] = round(8 * T * C * 2 * 2 / 1e6, 1)

    # big matmul: achievable bf16 peak (4096^2 @ 4096^2 = 137 GFLOP/iter)
    M = 4096
    a = jnp.asarray(rng.randn(M, M) * 0.02, jnp.bfloat16)
    b = jnp.asarray(rng.randn(M, M) * 0.02, jnp.bfloat16)
    fn = jax.jit(lambda x: lax.fori_loop(0, N, lambda i, y: (y @ b) * 0.5, x))
    t = timed(fn, a)
    res["matmul4096_ms"] = round(t, 4)
    res["achieved_bf16_tflops"] = round(2 * M ** 3 / (t / 1e3) / 1e12, 1)

    # int8 4096 matmul: achievable s8 peak
    a8 = jnp.asarray(rng.randint(-8, 8, (M, M)), jnp.int8)
    b8 = jnp.asarray(rng.randint(-127, 127, (M, M)), jnp.int8)

    def body8(i, y):
        z = lax.dot_general(y, b8, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
        return jnp.clip(z >> 7, -127, 127).astype(jnp.int8)
    fn8 = jax.jit(lambda x: lax.fori_loop(0, N, body8, x))
    t8 = timed(fn8, a8)
    res["matmul4096_int8_ms"] = round(t8, 4)
    res["achieved_int8_tops"] = round(2 * M ** 3 / (t8 / 1e3) / 1e12, 1)

    print(json.dumps(res))


if __name__ == "__main__":
    main()
