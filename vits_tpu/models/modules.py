"""Core neural blocks: WaveNet stack, HiFi-GAN resblocks, coupling flows.

Capability parity with the reference's modules.py (WN:93-182, ResBlock1:185-220,
ResBlock2:223-260, ResidualCouplingLayer:314-375, Flip:278-289, Log:263-275,
ElementwiseAffine:292-311, Swish:14-30, LayerNorm:33-44), re-designed for TPU:
channel-last (B, T, C) tensors, single masked implementation for both training
and inference (mask=None ⇒ dense path), explicit dropout RNG.

Parameter-tree key names intentionally mirror the reference's module paths so
torch checkpoints load through vits_tpu.utils.torch_compat.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from vits_tpu.nn.core import (
    Conv1d,
    Dense,
    LayerNorm,
    dropout as drop_fn,
    leaky_relu,
)
from vits_tpu.nn.packed import conv1d_packed, mask_packed
from vits_tpu.nn import quant as Q

LRELU_SLOPE = 0.1


def _mask(x, x_mask):
    return x if x_mask is None else x * x_mask


@dataclasses.dataclass(frozen=True)
class Swish:
    """x * sigmoid(w * x) with a learned scalar (modules.py:14-30)."""
    num_parameters: int = 1
    init: float = 1.0

    def init_params(self, key):
        del key
        return {"weight": jnp.full((self.num_parameters,), self.init)}

    def apply(self, p, x):
        return x * jax.nn.sigmoid(p["weight"] * x)

    __call__ = apply


@dataclasses.dataclass(frozen=True)
class WN:
    """Gated dilated conv stack with res/skip and speaker conditioning.

    Reference: modules.WN (modules.py:93-155). The speaker embedding enters
    through one weight-normed Linear producing 2*hidden*n_layers channels,
    sliced per layer. Skip accumulation is fused into a single running sum.
    """
    hidden_channels: int
    kernel_size: int
    dilation_rate: int
    n_layers: int
    gin_channels: int = 0
    p_dropout: float = 0.0

    def _in_layer(self, i):
        dilation = self.dilation_rate ** i
        pad = (self.kernel_size * dilation - dilation) // 2
        return Conv1d(self.hidden_channels, 2 * self.hidden_channels,
                      self.kernel_size, padding=pad, dilation=dilation,
                      weight_norm=True)

    def _res_skip_layer(self, i):
        out = 2 * self.hidden_channels if i < self.n_layers - 1 else self.hidden_channels
        return Conv1d(self.hidden_channels, out, 1, weight_norm=True)

    def init_params(self, key):
        keys = jax.random.split(key, 2 * self.n_layers + 1)
        p = {
            "in_layers": {str(i): self._in_layer(i).init_params(keys[i])
                          for i in range(self.n_layers)},
            "res_skip_layers": {str(i): self._res_skip_layer(i).init_params(keys[self.n_layers + i])
                                for i in range(self.n_layers)},
        }
        if self.gin_channels != 0:
            p["cond_layer"] = Dense(self.gin_channels, 2 * self.hidden_channels * self.n_layers,
                                    weight_norm=True).init_params(keys[-1])
        return p

    def apply(self, p, x, x_mask=None, g=None, rng=None, train=False):
        h = self.hidden_channels
        output = jnp.zeros_like(x)
        if self.gin_channels != 0:
            cond = Dense(self.gin_channels, 2 * h * self.n_layers,
                         weight_norm=True).apply(p["cond_layer"], g)  # (B, 2h*L)
        for i in range(self.n_layers):
            x_in = self._in_layer(i).apply(p["in_layers"][str(i)], x)
            if self.gin_channels != 0:
                g_l = cond[:, None, i * 2 * h:(i + 1) * 2 * h]
                acts_in = x_in + g_l
            else:
                acts_in = x_in
            acts = jnp.tanh(acts_in[..., :h]) * jax.nn.sigmoid(acts_in[..., h:])
            if train and self.p_dropout > 0 and rng is not None:
                rng, sub = jax.random.split(rng)
                acts = drop_fn(sub, acts, self.p_dropout, deterministic=False)
            res_skip = self._res_skip_layer(i).apply(p["res_skip_layers"][str(i)], acts)
            if i < self.n_layers - 1:
                x = _mask(x + res_skip[..., :h], x_mask)
                output = output + res_skip[..., h:]
            else:
                output = output + res_skip
        return _mask(output, x_mask)

    __call__ = apply


def _round16(c):
    return (c // 16) * 16


@dataclasses.dataclass(frozen=True)
class ResBlock1:
    """Speaker-conditioned HiFi-GAN resblock, tanh-gated variant
    (modules.py:185-220): xt = tanh(conv1(lrelu(x)) + cond(g))."""
    channels: int
    kernel_size: int = 3
    dilation: Tuple[int, ...] = (1, 3, 5)
    gin_channels: int = 0

    @property
    def inter_channels(self):
        return _round16(self.channels)

    def _c1(self, d):
        pad = (self.kernel_size * d - d) // 2
        return Conv1d(self.channels, self.inter_channels * 2, self.kernel_size,
                      padding=pad, dilation=d, weight_norm=True)

    def _c2(self):
        pad = (self.kernel_size - 1) // 2
        return Conv1d(self.inter_channels, self.channels, self.kernel_size,
                      padding=pad, weight_norm=True)

    def _cond(self):
        return Dense(self.gin_channels, self.inter_channels * 2, weight_norm=True)

    def init_params(self, key):
        n = len(self.dilation)
        keys = jax.random.split(key, 3 * n)
        return {
            "convs1": {str(i): self._c1(d).init_params(keys[i]) for i, d in enumerate(self.dilation)},
            "convs2": {str(i): self._c2().init_params(keys[n + i]) for i in range(n)},
            "conds": {str(i): self._cond().init_params(keys[2 * n + i]) for i in range(n)},
        }

    def apply(self, p, x, g, x_mask=None, record=None, rec_prefix=""):
        del record, rec_prefix  # int8 quantization implemented for ResBlock2
        ic = self.inter_channels
        for i, d in enumerate(self.dilation):
            xt = leaky_relu(x, LRELU_SLOPE)
            xt = self._c1(d).apply(p["convs1"][str(i)], xt)
            gs = self._cond().apply(p["conds"][str(i)], g)
            xt = jnp.tanh(xt + gs[:, None, :])
            # NOTE: reference ResBlock1 is shape-inconsistent (convs1 emits
            # inter*2 but convs2 expects inter, modules.py:189-219) and unused
            # by shipped configs; we take the first half to keep shapes sound.
            # conv2 input masked so padded == exact-length (gating biases are
            # nonzero in the pad region).
            xt = self._c2().apply(p["convs2"][str(i)], _mask(xt[..., :ic], x_mask))
            x = _mask(xt + x, x_mask)
        return x

    def apply_packed(self, p, x, g, pack, x_mask=None, record=None, rec_prefix=""):
        """Same numerics on phase-packed (B, T/pack, pack*C) input
        (nn.packed); the per-channel gate broadcasts across phases."""
        del record, rec_prefix  # int8 quantization implemented for ResBlock2
        ic = self.inter_channels
        for i, d in enumerate(self.dilation):
            xt = leaky_relu(x, LRELU_SLOPE)
            xt = conv1d_packed(self._c1(d), p["convs1"][str(i)], xt, pack)
            gs = self._cond().apply(p["conds"][str(i)], g)
            b, m, _ = xt.shape
            xt = jnp.tanh(xt.reshape(b, m, pack, 2 * ic) + gs[:, None, None, :])
            xt = xt[..., :ic].reshape(b, m, pack * ic)
            xt = conv1d_packed(self._c2(), p["convs2"][str(i)],
                               mask_packed(xt, x_mask, pack), pack)
            x = mask_packed(xt + x, x_mask, pack)
        return x

    __call__ = apply


@dataclasses.dataclass(frozen=True)
class ResBlock2:
    """GLU-gated speaker-conditioned resblock (modules.py:223-260), the
    configured default (configs/base.json "resblock": "2")."""
    channels: int
    kernel_size: int = 3
    dilation: Tuple[int, ...] = (1, 3, 5)
    gin_channels: int = 0

    @property
    def inter_channels(self):
        return _round16(self.channels)

    def _c1(self, d):
        pad = (self.kernel_size * d - d) // 2
        return Conv1d(self.channels, self.inter_channels, self.kernel_size,
                      padding=pad, dilation=d, weight_norm=True)

    def _c2(self):
        pad = (self.kernel_size - 1) // 2
        return Conv1d(self.inter_channels // 2, self.channels, self.kernel_size,
                      padding=pad, weight_norm=True)

    def _cond(self):
        return Dense(self.gin_channels, self.inter_channels, weight_norm=True)

    def init_params(self, key):
        n = len(self.dilation)
        keys = jax.random.split(key, 3 * n)
        return {
            "convs1": {str(i): self._c1(d).init_params(keys[i]) for i, d in enumerate(self.dilation)},
            "convs2": {str(i): self._c2().init_params(keys[n + i]) for i in range(n)},
            "conds": {str(i): self._cond().init_params(keys[2 * n + i]) for i in range(n)},
        }

    def apply(self, p, x, g, x_mask=None, record=None, rec_prefix=""):
        half = self.inter_channels // 2
        for i, d in enumerate(self.dilation):
            xt = leaky_relu(x, LRELU_SLOPE)
            if record is not None:
                record[f"{rec_prefix}c1_{i}"] = Q.amax(xt)
            xt = self._c1(d).apply(p["convs1"][str(i)], xt)
            gs = self._cond().apply(p["conds"][str(i)], g)
            xa, xb = xt[..., :half], xt[..., half:]
            sa, sb = gs[:, None, :half], gs[:, None, half:]
            xt = jnp.tanh(xa + sa) * jax.nn.sigmoid(xb + sb)
            # conv2 input masked so padded == exact-length decode (the gate is
            # bias-nonzero in the pad region and conv2 has k>1)
            xt = _mask(xt, x_mask)
            if record is not None:
                record[f"{rec_prefix}c2_{i}"] = Q.amax(xt)
            xt = self._c2().apply(p["convs2"][str(i)], xt)
            x = _mask(xt + x, x_mask)
        return x

    def apply_packed(self, p, x, g, pack, x_mask=None, record=None, rec_prefix=""):
        """Same numerics on phase-packed (B, T/pack, pack*C) input
        (nn.packed); the GLU gate is per-channel so it broadcasts across
        phases after a free minor-dim reshape."""
        half = self.inter_channels // 2
        for i, d in enumerate(self.dilation):
            xt = leaky_relu(x, LRELU_SLOPE)
            if record is not None:
                record[f"{rec_prefix}c1_{i}"] = Q.amax(xt)
            xt = conv1d_packed(self._c1(d), p["convs1"][str(i)], xt, pack)
            gs = self._cond().apply(p["conds"][str(i)], g)
            b, m, _ = xt.shape
            xt4 = xt.reshape(b, m, pack, 2 * half)
            sa, sb = gs[:, None, None, :half], gs[:, None, None, half:]
            xt4 = jnp.tanh(xt4[..., :half] + sa) * jax.nn.sigmoid(xt4[..., half:] + sb)
            xt = mask_packed(xt4.reshape(b, m, pack * half), x_mask, pack)
            if record is not None:
                record[f"{rec_prefix}c2_{i}"] = Q.amax(xt)
            xt = conv1d_packed(self._c2(), p["convs2"][str(i)], xt, pack)
            x = mask_packed(xt + x, x_mask, pack)
        return x

    def quantize_params(self, p, scales, pack, prefix=""):
        """Post-training int8 quantization (nn.quant) of this block's convs,
        pre-packed at the stage's phase-pack factor. scales: the max-abs dict
        from a calibration run (apply/apply_packed with record=...).
        Conditioning Denses stay in the float path."""
        from vits_tpu.nn.core import wn_kernel
        qp = {"conds": p["conds"]}
        for i, d in enumerate(self.dilation):
            for tag, layer, pp in (("c1", self._c1(d), p["convs1"][str(i)]),
                                   ("c2", self._c2(), p["convs2"][str(i)])):
                w8, s_w, _, _, _ = Q.pack_quantize_kernel(
                    wn_kernel(pp), layer.kernel_size, pack, layer.dilation,
                    layer.padding)
                qp[f"{tag}_{i}"] = {
                    "w8": w8, "s_w": s_w,
                    "b": Q.tile_bias(pp.get("b"), pack),
                    "s_in": Q.act_scale(scales[f"{prefix}{tag}_{i}"]),
                }
        return qp

    def apply_q8(self, qp, x, g, pack=1, x_mask=None):
        """int8 forward (serving mode): convs run s8×s8→s32 on the MXU with
        calibrated activation scales; GLU gates and residuals stay in the
        activation dtype. pack must match quantize_params.

        Measured fusion note (BASELINE.md roofline, 2026-08-21): keeping the
        conv epilogue SIMPLE (dequant→bf16 in conv1d_q8) lets XLA fuse it
        into the convolution, and the gate + the next conv's quantize_act
        fuse into one elementwise pass. Folding the gate+requant INTO the
        conv epilogue instead (a conv1d_q8→int8 variant with an activation
        closure) was tried and made the stages ~50% SLOWER — the complex
        epilogue defeats conv output fusion and the s32 accumulator
        materializes in HBM. Don't refactor this into a fused-epilogue form
        without re-measuring per-stage times on the chip."""
        half = self.inter_channels // 2
        for i, d in enumerate(self.dilation):
            q1, q2 = qp[f"c1_{i}"], qp[f"c2_{i}"]
            xt = leaky_relu(x, LRELU_SLOPE)
            c1 = self._c1(d)
            fmin, fmax, rd = Q.conv_geometry(c1.kernel_size, pack, c1.dilation, c1.padding)
            xt = Q.conv1d_q8(Q.quantize_act(xt, q1["s_in"]), q1["w8"], fmin, fmax,
                             q1["s_in"], q1["s_w"], q1["b"], out_dtype=x.dtype,
                             rhs_dilation=rd)
            gs = self._cond().apply(qp["conds"][str(i)], g)
            b, m, _ = xt.shape
            xt4 = xt.reshape(b, m, pack, 2 * half)
            sa, sb = gs[:, None, None, :half], gs[:, None, None, half:]
            xt4 = jnp.tanh(xt4[..., :half] + sa) * jax.nn.sigmoid(xt4[..., half:] + sb)
            xt = mask_packed(xt4.reshape(b, m, pack * half), x_mask, pack)
            c2 = self._c2()
            fmin, fmax, rd = Q.conv_geometry(c2.kernel_size, pack, c2.dilation, c2.padding)
            xt = Q.conv1d_q8(Q.quantize_act(xt, q2["s_in"]), q2["w8"], fmin, fmax,
                             q2["s_in"], q2["s_w"], q2["b"], out_dtype=x.dtype,
                             rhs_dilation=rd)
            x = mask_packed(xt + x, x_mask, pack)
        return x

    __call__ = apply


@dataclasses.dataclass(frozen=True)
class ResidualCouplingLayer:
    """Affine (mean-only) coupling over channel halves (modules.py:314-375).
    post conv zero-initialized so each flow starts at identity."""
    channels: int
    hidden_channels: int
    kernel_size: int
    dilation_rate: int
    n_layers: int
    p_dropout: float = 0.0
    gin_channels: int = 0
    mean_only: bool = True

    @property
    def half_channels(self):
        return self.channels // 2

    def _pre(self):
        return Conv1d(self.half_channels, self.hidden_channels, 1)

    def _enc(self):
        return WN(self.hidden_channels, self.kernel_size, self.dilation_rate,
                  self.n_layers, gin_channels=self.gin_channels,
                  p_dropout=self.p_dropout)

    def _post(self):
        return Conv1d(self.hidden_channels, self.half_channels * (2 - int(self.mean_only)), 1)

    def init_params(self, key):
        k1, k2, k3 = jax.random.split(key, 3)
        post = self._post().init_params(k3)
        post["w"] = jnp.zeros_like(post["w"])
        post["b"] = jnp.zeros_like(post["b"])
        return {"pre": self._pre().init_params(k1),
                "enc": self._enc().init_params(k2),
                "post": post}

    def apply(self, p, x, x_mask=None, g=None, reverse=False, rng=None, train=False):
        half = self.half_channels
        x0, x1 = x[..., :half], x[..., half:]
        h = _mask(self._pre().apply(p["pre"], x0), x_mask)
        h = self._enc().apply(p["enc"], h, x_mask, g=g, rng=rng, train=train)
        stats = _mask(self._post().apply(p["post"], h), x_mask)
        if self.mean_only:
            m, logs = stats, jnp.zeros_like(stats)
        else:
            m, logs = stats[..., :half], stats[..., half:]
        if not reverse:
            x1 = _mask(m + x1 * jnp.exp(logs), x_mask)
            logdet = jnp.sum(logs, axis=(1, 2))
            return jnp.concatenate([x0, x1], axis=-1), logdet
        x1 = _mask((x1 - m) * jnp.exp(-logs), x_mask)
        return jnp.concatenate([x0, x1], axis=-1)

    __call__ = apply


def flip_channels(x):
    """modules.Flip (modules.py:278-289): reverse the channel axis."""
    return jnp.flip(x, axis=-1)


@dataclasses.dataclass(frozen=True)
class ElementwiseAffine:
    """modules.ElementwiseAffine (modules.py:292-311); present-but-unused in
    the reference model, kept for capability parity."""
    channels: int

    def init_params(self, key):
        del key
        return {"m": jnp.zeros((self.channels,)), "logs": jnp.zeros((self.channels,))}

    def apply(self, p, x, x_mask=None, reverse=False):
        if not reverse:
            y = _mask(p["m"] + jnp.exp(p["logs"]) * x, x_mask)
            logdet = jnp.sum(jnp.broadcast_to(p["logs"], x.shape) * (x_mask if x_mask is not None else 1.0),
                             axis=(1, 2))
            return y, logdet
        return _mask((x - p["m"]) * jnp.exp(-p["logs"]), x_mask)

    __call__ = apply


def log_flow(x, x_mask=None, reverse=False):
    """modules.Log (modules.py:263-275)."""
    if not reverse:
        y = _mask(jnp.log(jnp.clip(x, min=1e-5)), x_mask)
        logdet = jnp.sum(-y, axis=(1, 2))
        return y, logdet
    return _mask(jnp.exp(x), x_mask)
