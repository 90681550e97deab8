"""Phase-packed (time-to-depth) 1-D convolutions for small-channel stages.

The late HiFi-GAN decoder stages (reference models.py:282-318 upsamples
512→256→128→64→32 channels while time grows 192×) run with C < 128, wasting
TPU vector lanes and HBM tile padding (a (T, 32) bf16 array is padded to 128
lanes — 4× traffic). Representing the signal as ``(B, T/p, p*C)`` with
``p*C == 128`` keeps every elementwise op and matmul tile dense.

A dilated conv over unpacked time is exactly equivalent to a small conv over
packed frames with a block-structured kernel: for output phase r and tap j,
the input sample lands at packed frame ``m + floor((r + j*d - P)/p)`` phase
``(r + j*d - P) mod p``. We scatter the original kernel ``w[K, C_in, C_out]``
into ``Wp[A, p_in*C_in, p_out*C_out]`` once per call (tiny) and run one dense
lax conv — identical numerics, full 128-lane tiles, 1/p the HBM padding
traffic.

The same construction covers torch-semantics transposed convs (stride u maps
pack p → u*p): ``y[t] = Σ_j x[(t + P - j)/u] * w[j]`` for ``u | (t + P - j)``.

Packing transitions are free: with phase-major feature order ``f = r*C + c``,
``(B, M, p*C) → (B, M*p/q, q*C)`` is a contiguous reshape.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp
from jax import lax

_DN1 = ("NWC", "WIO", "NWC")


def _phase_map_regular(kernel_size, pack, dilation, padding):
    """Map (frame-offset a, in-phase q, out-phase r) → source tap j.

    Returns (fmin, fmax, jidx[A, p, p], valid[A, p, p]) for a stride-1 conv
    y[t] = Σ_j x[t + j*d - P] w[j] packed at p in and out.
    """
    K, p, d, P = kernel_size, pack, dilation, padding
    deltas = [(r, j, r + j * d - P) for r in range(p) for j in range(K)]
    fmin = min(delta // p for _, _, delta in deltas)
    fmax = max(delta // p for _, _, delta in deltas)
    A = fmax - fmin + 1
    jidx = np.zeros((A, p, p), np.int32)
    valid = np.zeros((A, p, p), bool)
    for r, j, delta in deltas:
        a, q = delta // p - fmin, delta % p
        jidx[a, q, r] = j
        valid[a, q, r] = True
    return fmin, fmax, jidx, valid


def _phase_map_transposed(kernel_size, pack_in, stride, padding):
    """Same map for a torch-semantics transposed conv: pack_out = stride*pack_in.

    y[t] = Σ_j x[(t + P - j)/u] w[j] where u | (t + P - j).
    Requires output length (T-1)*u - 2P + K == T*u, i.e. K == 2P + u
    (true for the decoder's k=2u, P=(k-u)/2 stages) — asserted by caller.
    """
    K, p_in, u, P = kernel_size, pack_in, stride, padding
    p_out = u * p_in
    entries = []
    for r in range(p_out):
        for j in range(K):
            if (r + P - j) % u == 0:
                entries.append((r, j, (r + P - j) // u))
    fmin = min(delta // p_in for _, _, delta in entries)
    fmax = max(delta // p_in for _, _, delta in entries)
    A = fmax - fmin + 1
    jidx = np.zeros((A, p_in, p_out), np.int32)
    valid = np.zeros((A, p_in, p_out), bool)
    for r, j, delta in entries:
        a, q = delta // p_in - fmin, delta % p_in
        jidx[a, q, r] = j
        valid[a, q, r] = True
    return fmin, fmax, jidx, valid


def _pack_kernel(w, jidx, valid):
    """w (K, C_in, C_out) → Wp (A, p_in*C_in, p_out*C_out), phase-major."""
    A, p_in, p_out = jidx.shape
    c_in, c_out = w.shape[1], w.shape[2]
    g = w[jidx.reshape(-1)].reshape(A, p_in, p_out, c_in, c_out)
    g = jnp.where(jnp.asarray(valid)[..., None, None], g, jnp.zeros((), w.dtype))
    return jnp.transpose(g, (0, 1, 3, 2, 4)).reshape(A, p_in * c_in, p_out * c_out)


def _packed_conv(x, Wp, fmin, fmax):
    return lax.conv_general_dilated(
        x, Wp, (1,), [(-fmin, fmax)], dimension_numbers=_DN1)


def conv1d_packed(layer, p, x, pack):
    """Apply a stride-1 ``nn.core.Conv1d`` on packed input (B, T/pack, pack*C_in),
    returning packed (B, T/pack, pack*C_out). Exact same numerics as
    ``layer.apply`` on unpacked input (zero padding commutes with packing)."""
    from vits_tpu.nn.core import wn_kernel
    assert layer.stride == 1 and layer.groups == 1
    assert not isinstance(layer.padding, str)
    # 'same'-length conv required so packed frame count is preserved
    assert 2 * layer.padding == layer.dilation * (layer.kernel_size - 1)
    w = wn_kernel(p)
    fmin, fmax, jidx, valid = _phase_map_regular(
        layer.kernel_size, pack, layer.dilation, layer.padding)
    y = _packed_conv(x, _pack_kernel(w, jidx, valid), fmin, fmax)
    if layer.bias:
        y = y + jnp.tile(p["b"], pack)
    return y


def conv_transpose1d_packed(layer, p, x, pack_in):
    """Apply an ``nn.core.ConvTranspose1d`` on packed input, output packed at
    pack_in*stride. Requires torch output length == T*stride (k == 2*pad + u)."""
    from vits_tpu.nn.core import wn_kernel
    assert layer.kernel_size == 2 * layer.padding + layer.stride, (
        "packed transposed conv needs output length T*stride")
    w = wn_kernel(p)  # (K, C_in, C_out), forward layout
    fmin, fmax, jidx, valid = _phase_map_transposed(
        layer.kernel_size, pack_in, layer.stride, layer.padding)
    y = _packed_conv(x, _pack_kernel(w, jidx, valid), fmin, fmax)
    if layer.bias:
        y = y + jnp.tile(p["b"], pack_in * layer.stride)
    return y


def pack(x, p):
    """(B, T, C) → (B, T/p, p*C), phase-major features."""
    b, t, c = x.shape
    return x.reshape(b, t // p, p * c)


def unpack(x, p):
    """(B, M, p*C) → (B, M*p, C)."""
    b, m, pc = x.shape
    return x.reshape(b, m * p, pc // p)


def repack(x, p_from, p_to):
    """(B, M, p_from*C) → (B, M*p_from/p_to, p_to*C); contiguous reshape."""
    if p_from == p_to:
        return x
    b, m, pc = x.shape
    return x.reshape(b, m * p_from // p_to, pc // p_from * p_to)


def mask_packed(x, x_mask, p):
    """Multiply packed (B, M, p*C) by an unpacked frame mask (B, M*p, 1)."""
    if x_mask is None:
        return x
    b, m, pc = x.shape
    mp = x_mask.reshape(b, m, p, 1)
    return (x.reshape(b, m, p, pc // p) * mp).reshape(b, m, pc)
