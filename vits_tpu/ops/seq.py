"""Mask / path / slicing primitives (pure functions, static shapes).

Capability parity with the reference's commons.py (sequence_mask,
generate_path, infer_path, slice_segments, rand_slice_segments, intersperse,
kl_divergence, gen_sin_table — commons.py:8-190), re-expressed for XLA:
everything is fixed-shape, mask-driven, and vmap/jit friendly.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def sequence_mask(lengths, max_length):
    """(B,) int lengths -> (B, max_length) bool mask. commons.py:120-124."""
    pos = jnp.arange(max_length, dtype=lengths.dtype)
    return pos[None, :] < lengths[:, None]


def generate_path(duration, mask):
    """Expand durations into a hard monotonic alignment path.

    duration: (B, T_x) non-negative (float) durations per text token.
    mask: (B, T_y, T_x) attn mask (y_mask x x_mask outer product).
    Returns (B, T_y, T_x) 0/1 path. Mirrors the cumsum-diff trick of
    commons.generate_path (commons.py:127-140).
    """
    b, t_y, t_x = mask.shape
    cum = jnp.cumsum(duration, axis=-1)  # (B, T_x)
    pos = jnp.arange(t_y, dtype=cum.dtype)
    # path[b, y, x] = (y < cum[b, x])
    path = (pos[None, :, None] < cum[:, None, :]).astype(mask.dtype)
    # subtract shifted-along-x to keep only the newly-covered rows
    path = path - jnp.pad(path, ((0, 0), (0, 0), (1, 0)))[:, :, :-1]
    return path * mask


def infer_path(duration, t_y):
    """Maskless variant used by two-phase inference (commons.py:143-155).

    duration: (B, T_x); t_y: static output frame count. Returns (B, T_y, T_x).
    """
    b, t_x = duration.shape
    cum = jnp.cumsum(duration, axis=-1)
    pos = jnp.arange(t_y, dtype=cum.dtype)
    path = (pos[None, :, None] < cum[:, None, :]).astype(duration.dtype)
    path = path - jnp.pad(path, ((0, 0), (0, 0), (1, 0)))[:, :, :-1]
    return path


def slice_segments(x, ids_str, segment_size):
    """Gather fixed-size time windows per batch element.

    x: (B, T, C); ids_str: (B,) start frames. Returns (B, segment_size, C).
    commons.slice_segments (commons.py:47-53) with vmapped dynamic_slice
    instead of a per-item Python loop.
    """
    def one(xi, s):
        return jax.lax.dynamic_slice_in_dim(xi, s, segment_size, axis=0)
    return jax.vmap(one)(x, ids_str)


def slice_segments_1d(x, ids_str, segment_size):
    """x: (B, T); ids_str: (B,) -> (B, segment_size)."""
    def one(xi, s):
        return jax.lax.dynamic_slice_in_dim(xi, s, segment_size, axis=0)
    return jax.vmap(one)(x, ids_str)


def rand_slice_segments(key, x, x_lengths, segment_size):
    """Random training windows (commons.rand_slice_segments, commons.py:56-63).

    x: (B, T, C). Returns (sliced (B, segment_size, C), ids_str (B,)).
    """
    b = x.shape[0]
    ids_str_max = x_lengths - segment_size + 1
    u = jax.random.uniform(key, (b,))
    ids_str = (u * ids_str_max).astype(jnp.int32)
    ids_str = jnp.maximum(ids_str, 0)
    return slice_segments(x, ids_str, segment_size), ids_str


def intersperse(lst, item):
    """commons.intersperse (commons.py:23-26) — host-side list utility."""
    result = [item] * (len(lst) * 2 + 1)
    result[1::2] = lst
    return result


def kl_divergence(m_p, logs_p, m_q, logs_q):
    """KL(P||Q) between diagonal Gaussians (commons.py:29-33)."""
    kl = (logs_q - logs_p) - 0.5
    kl += 0.5 * (jnp.exp(2.0 * logs_p) + jnp.square(m_p - m_q)) * jnp.exp(-2.0 * logs_q)
    return kl


def gen_sin_table(max_len, d_model):
    """Sinusoidal positional table, (1, max_len, d_model).

    Interleaved sin/cos over pairs of channels, matching
    commons.gen_sin_table (commons.py:176-190).
    """
    position = np.arange(max_len, dtype=np.float32)[:, None]
    div_term = np.exp(np.arange(0, d_model, 2, dtype=np.float32) * -(math.log(10000.0) / d_model))
    pe = np.zeros((max_len, d_model), dtype=np.float32)
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return jnp.asarray(pe[None])


def clip_grad_value(grads, clip_value):
    """Value-clip a grad pytree and return (clipped, global 2-norm-of-norms).

    Mirrors commons.clip_grad_value_ (commons.py:158-173): per-leaf L2 norms
    accumulated as sum of squares, value clamp applied elementwise.
    """
    leaves = jax.tree_util.tree_leaves(grads)
    total = jnp.sqrt(sum(jnp.sum(jnp.square(g.astype(jnp.float32))) for g in leaves))
    if clip_value is not None:
        grads = jax.tree_util.tree_map(lambda g: jnp.clip(g, -clip_value, clip_value), grads)
    return grads, total
