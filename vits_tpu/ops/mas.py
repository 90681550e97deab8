"""Monotonic Alignment Search (MAS) — on-device dynamic programming.

The reference depends on the external `monotonic_align` pip package (Cython→C,
nogil batch loop) called from models.py:498, which forces a device→host→device
round-trip per training step. Here MAS runs on-chip:

  * ``maximum_path_ref``   — numpy scalar-loop reference (tests only);
  * ``maximum_path_scan``  — vectorized `lax.scan` over spec frames, batched;
  * ``maximum_path_pallas``— Pallas TPU kernel: per-utterance DP in VMEM,
                             grid over the batch, no host sync;
  * ``maximum_path``       — dispatcher (pallas on TPU, scan elsewhere).

Semantics (identical to the Cython kernel): viterbi over hard monotonic
alignments y→x with x non-decreasing, step ∈ {0, +1}, starting at (0, 0) and
ending at (t_y-1, t_x-1); cells outside the feasible band keep value = -inf;
backtrace moves left when ``x == y`` or ``value[y-1, x] < value[y-1, x-1]``
(strict), matching tie-breaking of the reference implementation.

Orientation: ``neg_cent[b, y, x]`` with y = spec frame (t_y), x = text token
(t_x), exactly the layout produced by SynthesizerTrn.forward
(models.py:485-498).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -1e9


def mask_to_lengths(mask):
    """attn_mask (B, T_y, T_x) -> (t_ys, t_xs) int32."""
    t_ys = mask[:, :, 0].sum(axis=1).astype(jnp.int32)
    t_xs = mask[:, 0, :].sum(axis=1).astype(jnp.int32)
    return t_ys, t_xs


# ---------------------------------------------------------------------------
# numpy reference (kept simple & obviously-correct; used by tests)
# ---------------------------------------------------------------------------

def maximum_path_ref(neg_cent: np.ndarray, t_ys: np.ndarray, t_xs: np.ndarray) -> np.ndarray:
    b, T_y, T_x = neg_cent.shape
    path = np.zeros((b, T_y, T_x), dtype=np.float32)
    for i in range(b):
        t_y, t_x = int(t_ys[i]), int(t_xs[i])
        value = neg_cent[i].astype(np.float64).copy()
        for y in range(t_y):
            lo = max(0, t_x + y - t_y)
            hi = min(t_x, y + 1)
            for x in range(lo, hi):
                v_cur = -np.inf if x == y else value[y - 1, x]
                if x == 0:
                    v_prev = 0.0 if y == 0 else -np.inf
                else:
                    v_prev = value[y - 1, x - 1]
                value[y, x] += max(v_prev, v_cur)
        idx = t_x - 1
        for y in range(t_y - 1, -1, -1):
            path[i, y, idx] = 1.0
            if idx != 0 and (idx == y or value[y - 1, idx] < value[y - 1, idx - 1]):
                idx -= 1
    return path


# ---------------------------------------------------------------------------
# vectorized JAX implementation
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=())
def maximum_path_scan(neg_cent, t_ys, t_xs):
    """neg_cent: (B, T_y, T_x); t_ys/t_xs: (B,) int32 -> 0/1 path in
    neg_cent.dtype.

    dtype contract (mirrors the Pallas kernel): the Viterbi DP accumulates in
    float32 regardless of input dtype — long bf16 accumulations lose enough
    mantissa to flip alignment tie-breaks vs the f32 kernel."""
    out_dtype = neg_cent.dtype
    neg_cent = neg_cent.astype(jnp.float32)
    B, T_y, T_x = neg_cent.shape
    xs = jnp.arange(T_x, dtype=jnp.int32)

    def feasible(y):
        # (B, T_x) mask of in-band cells at row y
        return (
            (xs[None, :] <= y)
            & (xs[None, :] >= (t_xs - t_ys + y)[:, None])
            & (xs[None, :] < t_xs[:, None])
            & (y < t_ys)[:, None]
        )

    def fwd(prev, inp):
        y, row = inp  # row: (B, T_x)
        first = jnp.where(y == 0, 0.0, NEG_INF)
        prev_shift = jnp.concatenate(
            [jnp.full((B, 1), first, prev.dtype), prev[:, :-1]], axis=1
        )
        best = jnp.maximum(prev, prev_shift)
        val = jnp.where(feasible(y), row + best, NEG_INF)
        return val, val

    ys = jnp.arange(T_y, dtype=jnp.int32)
    init = jnp.full((B, T_x), NEG_INF, neg_cent.dtype)
    _, value = jax.lax.scan(fwd, init, (ys, jnp.moveaxis(neg_cent, 1, 0)))
    # value: (T_y, B, T_x)

    def bwd(idx, inp):
        y, val_prev = inp  # val_prev = value[y-1] (B, T_x); undefined at y==0
        active = y < t_ys
        row = (xs[None, :] == idx[:, None]).astype(out_dtype) * active[:, None].astype(out_dtype)
        v_here = jnp.take_along_axis(val_prev, idx[:, None], axis=1)[:, 0]
        v_left = jnp.take_along_axis(val_prev, jnp.maximum(idx - 1, 0)[:, None], axis=1)[:, 0]
        move = active & (y > 0) & (idx != 0) & ((idx == y) | (v_here < v_left))
        return idx - move.astype(jnp.int32), row

    value_prev = jnp.concatenate([jnp.full((1, B, T_x), NEG_INF, value.dtype), value[:-1]], axis=0)
    idx0 = jnp.maximum(t_xs - 1, 0)
    _, rows = jax.lax.scan(bwd, idx0, (ys, value_prev), reverse=True)
    return jnp.moveaxis(rows, 0, 1)  # (B, T_y, T_x)


# ---------------------------------------------------------------------------
# Pallas TPU kernel
# ---------------------------------------------------------------------------

def _mas_kernel(tys_ref, txs_ref, neg_ref, path_ref, value_ref):
    """One grid step = one utterance. neg_ref/path_ref: (1, T_y, T_x) block;
    value_ref: VMEM scratch (T_y, T_x)."""
    import jax.numpy as jnp  # local for clarity inside kernel

    T_y, T_x = value_ref.shape
    b = pl.program_id(0)
    t_y = tys_ref[b]
    t_x = txs_ref[b]
    xs = jax.lax.broadcasted_iota(jnp.int32, (1, T_x), 1)

    def fwd_body(y, prev):
        # prev: (1, T_x) row of DP values at y-1 (NEG_INF outside band)
        first = jnp.where(y == 0, 0.0, NEG_INF)
        shifted = jnp.concatenate([jnp.full((1, 1), first, prev.dtype), prev[:, :-1]], axis=1)
        best = jnp.maximum(prev, shifted)
        feas = (xs <= y) & (xs >= t_x - t_y + y) & (xs < t_x) & (y < t_y)
        val = jnp.where(feas, neg_ref[0, pl.ds(y, 1), :] + best, NEG_INF)
        value_ref[pl.ds(y, 1), :] = val
        return val

    init = jnp.full((1, T_x), NEG_INF, jnp.float32)
    jax.lax.fori_loop(0, T_y, fwd_body, init)

    # Backtrace. Mosaic forbids dynamic scalar gathers along the lane dim, so
    # the two DP-cell reads become full-row loads + masked max-reductions
    # (VPU-friendly, still O(T_x) per step).
    def bwd_body(i, idx):
        y = T_y - 1 - i
        active = y < t_y
        onehot = xs == idx
        path_ref[0, pl.ds(y, 1), :] = (onehot & active).astype(path_ref.dtype)
        yp = jnp.maximum(y - 1, 0)
        row = value_ref[pl.ds(yp, 1), :]  # (1, T_x)
        v_here = jnp.max(jnp.where(onehot, row, NEG_INF))
        v_left = jnp.max(jnp.where(xs == idx - 1, row, NEG_INF))
        move = active & (y > 0) & (idx != 0) & ((idx == y) | (v_here < v_left))
        return idx - move.astype(jnp.int32)

    jax.lax.fori_loop(0, T_y, bwd_body, jnp.maximum(t_x - 1, 0))


try:  # Pallas imports are TPU-oriented; keep soft for CPU-only environments
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False


def maximum_path_pallas(neg_cent, t_ys, t_xs, interpret=False):
    B, T_y, T_x = neg_cent.shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, T_y, T_x), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, T_y, T_x), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((T_y, T_x), jnp.float32)],
    )
    return pl.pallas_call(
        _mas_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, T_y, T_x), jnp.float32),
        interpret=interpret,
    )(t_ys.astype(jnp.int32), t_xs.astype(jnp.int32), neg_cent.astype(jnp.float32))


def maximum_path(neg_cent, mask, impl: str = "auto"):
    """Drop-in equivalent of monotonic_align.maximum_path(neg_cent, mask).

    neg_cent: (B, T_y, T_x); mask: (B, T_y, T_x) 0/1. Returns float path.
    """
    t_ys, t_xs = mask_to_lengths(mask)
    # Zero out-of-band cells (defensive: the DP's internal band logic never
    # reads them, so this only normalizes padding garbage to 0).
    neg_cent = neg_cent * mask
    if impl == "auto":
        try:
            impl = "pallas" if (jax.default_backend() not in ("cpu",) and _HAS_PALLAS) else "scan"
        except Exception:
            impl = "scan"
    if impl == "pallas":
        # kernel computes/emits f32; keep the caller's dtype contract (the
        # 0/1 path is exact in bf16) so bf16 training graphs stay bf16
        return maximum_path_pallas(neg_cent, t_ys, t_xs).astype(neg_cent.dtype)
    return maximum_path_scan(neg_cent, t_ys, t_xs)
