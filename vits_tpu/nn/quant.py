"""int8 quantized inference ops (opt-in serving mode).

The TPU v5e MXU runs s8×s8→s32 convolutions at ~1.8× the bf16 rate (measured
252 TOPS vs 141 TF/s at the decoder's packed shapes, scripts/probe_chip2.py),
and int8 activations halve HBM traffic. This module provides post-training
quantization for the HiFi-GAN decoder's resblock convolutions — the analog of
the reference's TensorRT deployment path (toolkits/onnx2engine.py, which
compiles the exported ONNX with reduced precision): per-output-channel
symmetric int8 weights, per-conv-instance calibrated activation scales, with
gates/residuals kept in bf16/f32.

Quantization contract:
  x8 = clip(round(x / s_in), -127, 127)
  w8[..., c] = clip(round(w[..., c] / s_w[c]), -127, 127)
  y  = conv_s8s8_s32(x8, w8) * (s_in * s_w) + bias

Packed kernels (nn.packed phase packing) are scattered to their dense
(A, p·C_in, p·C_out) form at quantize time, so the hot path is a single
int8 lax conv per layer with a fused dequant epilogue.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from vits_tpu.nn.packed import _pack_kernel, _phase_map_regular, _phase_map_transposed

_DN1 = ("NWC", "WIO", "NWC")

Q_MAX = 127.0


def amax(x):
    """Max-abs of a tensor (calibration statistic)."""
    return jnp.max(jnp.abs(x.astype(jnp.float32)))


def act_scale(a, eps=1e-12):
    """Activation scale from a calibrated max-abs."""
    return jnp.maximum(jnp.asarray(a, jnp.float32), eps) / Q_MAX


def quantize_act(x, scale):
    """bf16/f32 activations → int8 at the given (scalar) scale."""
    q = jnp.round(x.astype(jnp.float32) / scale)
    return jnp.clip(q, -Q_MAX, Q_MAX).astype(jnp.int8)


def quantize_kernel(w, eps=1e-12):
    """Per-output-channel symmetric int8 quantization of a (K, C_in, C_out)
    (or (A, pC_in, pC_out)) kernel. Returns (w8, s_w[C_out] float32)."""
    w = jnp.asarray(w, jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(w), axis=tuple(range(w.ndim - 1))), eps) / Q_MAX
    w8 = jnp.clip(jnp.round(w / s), -Q_MAX, Q_MAX).astype(jnp.int8)
    return w8, s


def pack_quantize_kernel(w, kernel_size, pack, dilation, padding):
    """Scatter a (K, C_in, C_out) kernel to its phase-packed dense form
    (nn.packed) and int8-quantize it.

    Returns (w8, s_w[p*C_out], fmin, fmax, rhs_dilation). pack == 1 keeps the
    plain dilated kernel (rhs_dilation == dilation); pack > 1 produces the
    dense packed kernel (rhs_dilation == 1)."""
    if pack == 1:
        w8, s = quantize_kernel(w)
        return w8, s, -padding, padding, dilation
    fmin, fmax, jidx, valid = _phase_map_regular(kernel_size, pack, dilation, padding)
    wp = _pack_kernel(jnp.asarray(w, jnp.float32), jidx, valid)
    w8, s = quantize_kernel(wp)
    return w8, s, fmin, fmax, 1


def pack_quantize_transposed_kernel(w, kernel_size, pack_in, stride, padding):
    """Scatter a torch-semantics transposed-conv kernel (K, C_in, C_out,
    forward layout) to its phase-packed dense form — (A, p_in*C_in,
    p_in*stride*C_out), output phase-major — and int8-quantize it per output
    channel. Requires the length-preserving geometry k == 2*pad + stride
    (nn.packed._phase_map_transposed). Analog of the reference's TRT engine
    compile of the ONNX ConvTranspose nodes (toolkits/onnx2engine.py:13-58).

    Returns (w8, s_w[p_in*stride*C_out])."""
    _, _, jidx, valid = _phase_map_transposed(kernel_size, pack_in, stride, padding)
    wp = _pack_kernel(jnp.asarray(w, jnp.float32), jidx, valid)
    return quantize_kernel(wp)


def transposed_geometry(kernel_size, pack_in, stride, padding):
    """Static edge geometry (fmin, fmax) of the packed transposed conv,
    matching pack_quantize_transposed_kernel."""
    fmin, fmax, _, _ = _phase_map_transposed(kernel_size, pack_in, stride, padding)
    return fmin, fmax


def conv1d_q8(x8, w8, fmin, fmax, s_in, s_w, bias=None, out_dtype=jnp.bfloat16,
              rhs_dilation=1):
    """s8×s8→s32 conv with fused dequant epilogue.

    x8: (B, M, C_in) int8; w8: (A, C_in, C_out) int8; edge padding
    (-fmin, fmax) (matches nn.packed._packed_conv / a 'same' plain conv).
    Returns (B, M, C_out) out_dtype = conv(x, w) * (s_in*s_w) + bias.
    """
    y = lax.conv_general_dilated(
        x8, w8, (1,), [(-fmin, fmax)], dimension_numbers=_DN1,
        rhs_dilation=(rhs_dilation,),
        preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * (jnp.asarray(s_in, jnp.float32) * s_w)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype)


def conv_geometry(kernel_size, pack, dilation, padding):
    """Static conv geometry matching pack_quantize_kernel: returns
    (fmin, fmax, rhs_dilation) for the int8 conv at the given pack factor."""
    if pack == 1:
        return -padding, padding, dilation
    fmin, fmax, _, _ = _phase_map_regular(kernel_size, pack, dilation, padding)
    return fmin, fmax, 1


def tile_scales(s, pack):
    """Per-channel scales (C,) → packed (p*C,) (phases share weights)."""
    if pack == 1:
        return s
    return jnp.tile(s, pack)


def tile_bias(b, pack):
    if b is None or pack == 1:
        return b
    return jnp.tile(b, pack)


def to_host_scalar(a):
    return float(np.asarray(a))
