#!/usr/bin/env python3
"""Micro-op timings at the hot decoder shapes (stage-1: (8, 36864, 128)).

Answers, with measured numbers, where the gap between the decoder's ~34 ms
bf16 time and its ~17 ms roofline estimate comes from: bare conv cost at each
kernel size/dilation, the cost of the GLU gate epilogue, int8 conv cost with
bf16-out vs int8-out (fused requant) epilogues, and an elementwise-traversal
baseline (pure HBM roundtrip).
"""

import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

_DN1 = ("NWC", "WIO", "NWC")


def timeit(fn, *args, iters=30):
    ck = jax.jit(lambda t: jnp.sum(t.astype(jnp.float32)))
    out = fn(*args)
    jax.device_get(ck(out))
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.device_get(ck(out))
    return (time.time() - t0) / iters * 1e3  # ms


def main():
    B, T, C = 8, 36864, 128
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, T, C), jnp.bfloat16)
    x8 = jnp.asarray(rng.randint(-127, 127, (B, T, C)), jnp.int8)
    res = {"shape": [B, T, C]}

    # elementwise traversal baseline: read+write one (B,T,C) bf16 tensor
    f = jax.jit(lambda a: a * 1.0001 + 0.5)
    res["elemwise_bf16_ms"] = timeit(f, x)

    # bare bf16 convs at the resblock kernel geometry
    for k, d in [(3, 1), (7, 1), (11, 1), (11, 5)]:
        w = jnp.asarray(rng.randn(k, C, C) * 0.05, jnp.bfloat16)
        pad = (k * d - d) // 2

        def conv(a, w=w, d=d, pad=pad):
            return lax.conv_general_dilated(a, w, (1,), [(pad, pad)],
                                            rhs_dilation=(d,),
                                            dimension_numbers=_DN1)
        res[f"conv_bf16_k{k}_d{d}_ms"] = timeit(jax.jit(conv), x)

    # bf16 conv + GLU gate epilogue (c1 + gate as in ResBlock2.apply)
    w3 = jnp.asarray(rng.randn(3, C, C) * 0.05, jnp.bfloat16)
    gs = jnp.asarray(rng.randn(B, C), jnp.bfloat16)

    def conv_gate(a):
        y = lax.conv_general_dilated(a, w3, (1,), [(1, 1)], dimension_numbers=_DN1)
        half = C // 2
        xa, xb = y[..., :half], y[..., half:]
        sa, sb = gs[:, None, :half], gs[:, None, half:]
        return jnp.tanh(xa + sa) * jax.nn.sigmoid(xb + sb)
    res["conv_gate_bf16_k3_ms"] = timeit(jax.jit(conv_gate), x)

    # int8 convs: s32 accum, three epilogue flavors
    w8 = jnp.asarray(rng.randint(-127, 127, (3, C, C)), jnp.int8)
    s_w = jnp.asarray(np.abs(rng.randn(C)) * 0.01 + 1e-3, jnp.float32)

    def conv8_raw(a):  # s32 out (no epilogue)
        return lax.conv_general_dilated(a, w8, (1,), [(1, 1)],
                                        dimension_numbers=_DN1,
                                        preferred_element_type=jnp.int32)
    res["conv_int8_s32out_ms"] = timeit(jax.jit(conv8_raw), x8)

    def conv8_bf16(a):  # dequant epilogue -> bf16 (current nn.quant path)
        y = conv8_raw(a)
        return (y.astype(jnp.float32) * (0.01 * s_w)).astype(jnp.bfloat16)
    res["conv_int8_bf16out_ms"] = timeit(jax.jit(conv8_bf16), x8)

    def conv8_int8(a):  # dequant + gate + requant epilogue -> int8 (fused)
        y = conv8_raw(a).astype(jnp.float32) * (0.01 * s_w)
        half = C // 2
        g = jnp.tanh(y[..., :half] + gs[:, None, :half].astype(jnp.float32)) \
            * jax.nn.sigmoid(y[..., half:] + gs[:, None, half:].astype(jnp.float32))
        q = jnp.round(g * (1.0 / 0.008))
        return jnp.clip(q, -127, 127).astype(jnp.int8)
    res["conv_int8_gate_int8out_ms"] = timeit(jax.jit(conv8_int8), x8)

    # chain of 2 int8 convs with bf16 intermediate + separate requant
    # (the CURRENT apply_q8 inner step) vs int8-to-int8 fused chain
    w8b = jnp.asarray(rng.randint(-127, 127, (3, C // 2, C)), jnp.int8)
    s_wb = jnp.asarray(np.abs(rng.randn(C)) * 0.01 + 1e-3, jnp.float32)

    def chain_current(a):
        y = conv8_bf16(a)  # bf16 materialized
        h = y[..., :C // 2]
        q = jnp.clip(jnp.round(h.astype(jnp.float32) / 0.008), -127, 127).astype(jnp.int8)
        z = lax.conv_general_dilated(q, w8b, (1,), [(1, 1)],
                                     dimension_numbers=_DN1,
                                     preferred_element_type=jnp.int32)
        return (z.astype(jnp.float32) * (0.008 * s_wb)).astype(jnp.bfloat16)
    res["chain2_int8_via_bf16_ms"] = timeit(jax.jit(chain_current), x8)

    def chain_fused(a):
        q = conv8_int8(a)  # int8 intermediate (half channels)
        z = lax.conv_general_dilated(q, w8b, (1,), [(1, 1)],
                                     dimension_numbers=_DN1,
                                     preferred_element_type=jnp.int32)
        return (z.astype(jnp.float32) * (0.008 * s_wb)).astype(jnp.bfloat16)
    res["chain2_int8_fused_ms"] = timeit(jax.jit(chain_fused), x8)

    # packed stage-3 geometry: p=4, C=32 -> dense (A=?, 128, 128) kernel
    from vits_tpu.nn.packed import _phase_map_regular, _pack_kernel
    fmin, fmax, jidx, valid = _phase_map_regular(3, 4, 1, 1)
    wp = _pack_kernel(jnp.asarray(rng.randn(3, 32, 32) * 0.05, jnp.float32),
                      jidx, valid).astype(jnp.bfloat16)
    res["packed_A"] = int(wp.shape[0])

    def conv_packed(a):
        return lax.conv_general_dilated(a, wp, (1,), [(-fmin, fmax)],
                                        dimension_numbers=_DN1)
    res["conv_bf16_packed_p4_k3_ms"] = timeit(jax.jit(conv_packed), x)

    for k, v in res.items():
        if isinstance(v, float):
            res[k] = round(v, 4)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
