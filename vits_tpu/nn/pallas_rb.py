"""VMEM-resident fused int8 ResBlock2 chain — Pallas TPU kernel.

The XLA int8 decoder path (modules.ResBlock2.apply_q8) runs each conv as a
separate HBM-resident op: per iteration the activation plane makes ~4 HBM
round trips (lrelu+quantize read/write, conv1, gate+quantize, conv2 +
residual), and the measured stages sit at 59-79% of their executed-FLOP
floor with the residual attributed to exactly this inter-conv glue
(BASELINE.md roofline). This kernel keeps ONE resblock's full 3-iteration
chain (lrelu -> int8 conv1 -> GLU gate -> int8 conv2 -> residual, x3)
resident in VMEM: the activation plane is DMA'd from HBM once per chunk
(with the chain's full stencil halo) and written back once.

Identical numerics to apply_q8 up to gate transcendental rounding: the same
round/clip int8 quantization, the same s8xs8->s32 tap matmuls on the MXU,
gate math in float32 cast back through bf16, the same phase-aware masking
(nn.packed.mask_packed semantics) via per-row valid frame counts.

Weight layout: conv1's packed output channels are PERMUTED at prep time
from the interleaved (phase, 2*half) order to [a-block (phase, half) |
b-block (phase, half)], so the GLU halves are contiguous lane slices and
the gate output lands exactly in conv2's packed (phase, half) input layout
with no in-kernel shuffles. conv1's bias is folded into the per-batch gate
bias vectors.

Reference surface: models.py:282-318 (HiFi-GAN resblock stack) deployed via
TRT reduced precision (toolkits/onnx2engine.py) — this is the TPU
speed-of-light analog (BASELINE.json north star).

MEASURED VERDICT (2026-08-21, scripts/probe_pallas_rb.py, BASELINE.md):
the fused chain loses ~10% to the XLA apply_q8 path at every decoder stage
(full decoder 55.1 vs 50.8 ms at B=8/T_y=768) — the per-tap matmuls need
sublane-unaligned VMEM slices whose Mosaic relayouts cost more than the
elementwise glue the fusion removes, and chunk sizes large enough to
amortize them OOM VMEM at stage 0. Kept in-tree behind
Generator.apply(..., q8_pallas=True) as the recorded experiment; do not
flip the default without re-measuring per-stage on the chip.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vits_tpu.nn import quant as Q

LRELU_SLOPE = 0.1


def _iter_geometry(rb, pack):
    """Static per-iteration conv geometry: [(l1, r1, rd1, A1, l2, r2, rd2,
    A2), ...] with l/r the left/right input margins of each conv."""
    out = []
    for d in rb.dilation:
        c1 = rb._c1(d)
        fmin1, fmax1, rd1 = Q.conv_geometry(c1.kernel_size, pack, c1.dilation,
                                            c1.padding)
        A1 = c1.kernel_size if pack == 1 else fmax1 - fmin1 + 1
        c2 = rb._c2()
        fmin2, fmax2, rd2 = Q.conv_geometry(c2.kernel_size, pack, c2.dilation,
                                            c2.padding)
        A2 = c2.kernel_size if pack == 1 else fmax2 - fmin2 + 1
        out.append((-fmin1, fmax1, rd1, A1, -fmin2, fmax2, rd2, A2))
    return out


def _conv_taps(q, w_ref, A, rd, S_out, out_lanes):
    """Valid conv over the VMEM-resident int8 plane as A tap matmuls:
    out[j] = sum_a q[j + a*rd] @ w[a], s8 x s8 -> s32 on the MXU."""
    acc = jnp.zeros((S_out, out_lanes), jnp.int32)
    for a in range(A):
        sl = q[a * rd:a * rd + S_out, :]
        acc = acc + jax.lax.dot_general(
            sl, w_ref[a],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
    return acc


def _frame_mask(S, lanes, cblk, pack, base_packed, valid):
    """Phase-aware validity mask: row j lane l is frame
    (base_packed + j) * pack + l // cblk; valid iff 0 <= frame < valid."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (S, lanes), 0)
    ls = jax.lax.broadcasted_iota(jnp.int32, (S, lanes), 1)
    frame = (base_packed + rows) * pack + ls // cblk
    return jnp.logical_and(frame >= 0, frame < valid)


def _quant(x, inv_s):
    q = jnp.round(x.astype(jnp.float32) * inv_s)
    return jnp.clip(q, -Q.Q_MAX, Q.Q_MAX).astype(jnp.int8)


def _make_kernel(geoms, T, S0, L, Lh, C, half, pack, Lm, dtype):
    def kernel(qs_ref, valid_ref,
               x_hbm,
               w10, w11, w12, w20, w21, w22,
               deq1_ref, deq2_ref, b2_ref, ga_ref, gb_ref,
               out_ref, xin, sem):
        b = pl.program_id(0)
        c = pl.program_id(1)
        cp = pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(c * T, S0), :], xin, sem)
        cp.start()
        cp.wait()
        valid = valid_ref[b]
        w1s = (w10, w11, w12)[:len(geoms)]
        w2s = (w20, w21, w22)[:len(geoms)]

        cur = xin[:]
        S_i = S0
        base = 0  # padded-coord offset of cur[0] is c*T; track orig via -Lm
        for i, (l1, r1, rd1, A1, l2, r2, rd2, A2) in enumerate(geoms):
            S_next = S_i - (l1 + r1 + l2 + r2)
            Sg = S_next + l2 + r2
            # comparison-free leaky relu (Mosaic rejects sub-32-bit compares
            # on this target): max(x,0) + slope*min(x,0)
            zero = dtype.type(0)
            xt = jnp.maximum(cur, zero) + dtype.type(LRELU_SLOPE) * jnp.minimum(cur, zero)
            q = _quant(xt, qs_ref[i, 0])
            y = _conv_taps(q, w1s[i], A1, rd1, Sg, L)
            yf = y.astype(jnp.float32) * deq1_ref[i][None, :]
            a_part = yf[:, :Lh] + ga_ref[0, i][None, :]
            b_part = yf[:, Lh:] + gb_ref[0, i][None, :]
            gate = (jnp.tanh(a_part) * jax.nn.sigmoid(b_part)).astype(dtype)
            gbase = base + l1 - Lm  # orig packed coord of gate[0] (+ c*T)
            gmask = _frame_mask(Sg, Lh, half, pack,
                                c * T + gbase, valid)
            gate = jnp.where(gmask, gate, dtype.type(0))
            q2 = _quant(gate, qs_ref[i, 1])
            y2 = _conv_taps(q2, w2s[i], A2, rd2, S_next, L)
            res = (y2.astype(jnp.float32) * deq2_ref[i][None, :]
                   + b2_ref[i][None, :]).astype(dtype)
            nxt = res + cur[l1 + l2:l1 + l2 + S_next, :]
            nbase = base + l1 + l2 - Lm
            nmask = _frame_mask(S_next, L, C, pack, c * T + nbase, valid)
            cur = jnp.where(nmask, nxt, dtype.type(0))
            base = base + l1 + l2
            S_i = S_next
        out_ref[0] = cur[:T]

    return kernel


def resblock2_chain_q8(rb, qp, x, g, pack=1, x_mask=None, chunk=1024,
                       interpret=False):
    """Fused Pallas forward of one ResBlock2's int8 chain.

    rb: models.modules.ResBlock2 (static config); qp: rb.quantize_params(...)
    output (the SAME params the XLA apply_q8 path uses); x: (B, M, pack*C)
    activations (bf16/f32), already masked like apply_q8's input; g: (B, gin)
    speaker vectors; x_mask: optional unpacked frame mask (B, M*pack, 1).
    Returns (B, M, pack*C), numerically matching rb.apply_q8.
    """
    import os
    chunk = int(os.environ.get("VITS_TPU_RB_CHUNK", chunk))  # static, trace-time
    B, M, L = x.shape
    C = rb.channels
    inter = rb.inter_channels
    half = inter // 2
    Lh = pack * half
    assert L == pack * C, (L, pack, C)
    dtype = x.dtype
    geoms = _iter_geometry(rb, pack)
    assert len(geoms) <= 3, "kernel is specialized for <=3 dilation iters"
    Lm = sum(g_[0] + g_[4] for g_ in geoms)
    Rm = sum(g_[1] + g_[5] for g_ in geoms)

    # ---- prep: permuted conv1 weights, fused dequant / gate-bias vectors
    perm = np.concatenate([
        np.arange(pack)[:, None] * inter + np.arange(half)[None, :],
        np.arange(pack)[:, None] * inter + half + np.arange(half)[None, :],
    ]).reshape(-1)  # a-block (ph, half) then b-block (ph, half)
    w1s, w2s, deq1, deq2, b2v, gav, gbv, qscales = [], [], [], [], [], [], [], []
    for i in range(len(rb.dilation)):
        q1, q2 = qp[f"c1_{i}"], qp[f"c2_{i}"]
        w1s.append(q1["w8"][:, :, perm])
        w2s.append(q2["w8"])
        d1 = (q1["s_in"].astype(jnp.float32)
              * Q.tile_scales(q1["s_w"], 1))[perm]
        deq1.append(d1)
        deq2.append(q2["s_in"].astype(jnp.float32) * q2["s_w"])
        b2 = q2.get("b")
        b2v.append(jnp.zeros((L,), jnp.float32) if b2 is None
                   else b2.astype(jnp.float32))
        gs = rb._cond().apply(qp["conds"][str(i)], g).astype(jnp.float32)
        b1 = q1.get("b")
        b1p = (jnp.zeros((2 * Lh,), jnp.float32) if b1 is None
               else b1.astype(jnp.float32)[perm])
        gav.append(jnp.tile(gs[:, :half], (1, pack)) + b1p[None, :Lh])
        gbv.append(jnp.tile(gs[:, half:], (1, pack)) + b1p[None, Lh:])
        qscales.append(jnp.stack([1.0 / q1["s_in"].astype(jnp.float32),
                                  1.0 / q2["s_in"].astype(jnp.float32)]))
    while len(w1s) < 3:  # pad unused weight slots (kernel slices by len)
        w1s.append(jnp.zeros((1, L, L), jnp.int8))
        w2s.append(jnp.zeros((1, Lh, L), jnp.int8))
    qs = jnp.stack(qscales)                     # (n_iter, 2) f32
    deq1 = jnp.stack(deq1)                      # (n, L)
    deq2 = jnp.stack(deq2)                      # (n, L)
    b2v = jnp.stack(b2v)                        # (n, L)
    ga = jnp.stack(gav, axis=1)                 # (B, n, Lh)
    gb = jnp.stack(gbv, axis=1)                 # (B, n, Lh)

    if x_mask is not None:
        valid = jnp.sum(x_mask[:, :, 0].astype(jnp.int32), axis=1)
    else:
        valid = jnp.full((B,), M * pack, jnp.int32)

    T = min(chunk, M)
    Mp = -(-M // T) * T
    n_chunks = Mp // T
    # DMA slice lengths must be sublane-tile aligned (Mosaic: multiples of
    # 32 cover f32/bf16/int8); extra rows read zeros and fall off the chain
    S0 = -(-(T + Lm + Rm) // 32) * 32
    extra = S0 - (T + Lm + Rm)
    xp = jnp.pad(x, ((0, 0), (Lm, Mp - M + Rm + extra), (0, 0)))

    kernel = _make_kernel(geoms, T, S0, L, Lh, C, half, pack, Lm,
                          jnp.dtype(dtype))
    grid = (B, n_chunks)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),            # qs
            pl.BlockSpec(memory_space=pltpu.SMEM),            # valid (B,)
            pl.BlockSpec(memory_space=pltpu.ANY),             # x_pad (manual DMA)
            pl.BlockSpec(memory_space=pltpu.VMEM),            # w1_0
            pl.BlockSpec(memory_space=pltpu.VMEM),            # w1_1
            pl.BlockSpec(memory_space=pltpu.VMEM),            # w1_2
            pl.BlockSpec(memory_space=pltpu.VMEM),            # w2_0
            pl.BlockSpec(memory_space=pltpu.VMEM),            # w2_1
            pl.BlockSpec(memory_space=pltpu.VMEM),            # w2_2
            pl.BlockSpec(memory_space=pltpu.VMEM),            # deq1
            pl.BlockSpec(memory_space=pltpu.VMEM),            # deq2
            pl.BlockSpec(memory_space=pltpu.VMEM),            # b2
            pl.BlockSpec((1, len(geoms), Lh), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),            # ga
            pl.BlockSpec((1, len(geoms), Lh), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),            # gb
        ],
        out_specs=pl.BlockSpec((1, T, L), lambda b, c: (b, c, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Mp, L), dtype),
        scratch_shapes=[
            pltpu.VMEM((S0, L), dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(qs, valid, xp, *w1s, *w2s, deq1, deq2, b2v, ga, gb)
    return out[:, :M]
