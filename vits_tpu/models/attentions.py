"""Transformer encoder for the text branch.

Capability parity with the reference attentions.py: Encoder (12-54),
MultiHeadAttention (57-100, plain SDPA — the fork removed relative-position
attention), FFN (103-126), FFN2 (gated GLU + speaker cond, 129-166, the
configured default), FFN3 (additive cond, 168-199).

TPU design: (B, T, C) channel-last; one masked implementation (mask=None for
dense batch-1 style inference); QKV projections are 1x1 convs in the reference
and become MXU matmuls here.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp

from vits_tpu.nn.core import Conv1d, Dense, LayerNorm, dropout as drop_fn


@dataclasses.dataclass(frozen=True)
class MultiHeadAttention:
    channels: int
    out_channels: int
    n_heads: int
    p_dropout: float = 0.0

    @property
    def k_channels(self):
        return self.channels // self.n_heads

    def init_params(self, key):
        kq, kk, kv, ko = jax.random.split(key, 4)
        c = self.channels
        mk = lambda k, ci, co: Conv1d(ci, co, 1, init="xavier").init_params(k)
        return {"conv_q": mk(kq, c, c), "conv_k": mk(kk, c, c),
                "conv_v": mk(kv, c, c),
                "conv_o": Conv1d(c, self.out_channels, 1).init_params(ko)}

    def apply(self, p, x, c, attn_mask=None, rng=None, train=False):
        ch, h = self.channels, self.n_heads
        d = self.k_channels
        B, T_t, _ = x.shape
        T_s = c.shape[1]
        conv = Conv1d(ch, ch, 1)
        q = conv.apply(p["conv_q"], x).reshape(B, T_t, h, d)
        k = conv.apply(p["conv_k"], c).reshape(B, T_s, h, d)
        v = conv.apply(p["conv_v"], c).reshape(B, T_s, h, d)
        scores = jnp.einsum("bthd,bshd->bhts", q / math.sqrt(d), k,
                            preferred_element_type=jnp.float32)
        if attn_mask is not None:
            scores = jnp.where(attn_mask == 0, -1e4, scores)
        probs = jax.nn.softmax(scores, axis=-1)  # fp32 for stability
        if train and self.p_dropout > 0 and rng is not None:
            probs = drop_fn(rng, probs, self.p_dropout, deterministic=False)
        out = jnp.einsum("bhts,bshd->bthd", probs.astype(v.dtype), v).reshape(B, T_t, ch)
        return Conv1d(ch, self.out_channels, 1).apply(p["conv_o"], out)

    __call__ = apply


def _mask(x, m):
    return x if m is None else x * m


@dataclasses.dataclass(frozen=True)
class FFN:
    """Plain conv FFN (attentions.py:103-126)."""
    in_channels: int
    out_channels: int
    filter_channels: int
    kernel_size: int
    p_dropout: float = 0.0
    gin_channels: int = 0

    def _c1(self):
        return Conv1d(self.in_channels, self.filter_channels, self.kernel_size,
                      padding=self.kernel_size // 2)

    def _c2(self):
        return Conv1d(self.filter_channels, self.out_channels, self.kernel_size,
                      padding=self.kernel_size // 2)

    def init_params(self, key):
        k1, k2 = jax.random.split(key)
        return {"conv_1": self._c1().init_params(k1), "conv_2": self._c2().init_params(k2)}

    def apply(self, p, x, x_mask=None, g=None, rng=None, train=False):
        # NOTE: conv_1 input is masked here (the reference leaves it unmasked
        # in forward(), attentions.py:118, leaking padding garbage into the
        # last k//2 valid frames); masking makes the padded graph bit-equal to
        # the reference's exact-length infer() path, which is what checkpoints
        # are verified against.
        x = jax.nn.relu(self._c1().apply(p["conv_1"], _mask(x, x_mask)))
        if train and self.p_dropout > 0 and rng is not None:
            x = drop_fn(rng, x, self.p_dropout, deterministic=False)
        x = self._c2().apply(p["conv_2"], _mask(x, x_mask))
        return _mask(x, x_mask)

    __call__ = apply


@dataclasses.dataclass(frozen=True)
class FFN2:
    """Gated (GLU-style) FFN with speaker conditioning — the configured
    default (attentions.py:129-166, configs/base.json "ffn": "FFN2")."""
    in_channels: int
    out_channels: int
    filter_channels: int
    kernel_size: int
    p_dropout: float = 0.0
    gin_channels: int = 0

    def _c1(self):
        return Conv1d(self.in_channels, self.filter_channels * 2, self.kernel_size,
                      padding=self.kernel_size // 2, init="xavier")

    def _c2(self):
        return Conv1d(self.filter_channels, self.out_channels, self.kernel_size,
                      padding=self.kernel_size // 2, init="xavier")

    def _cond(self):
        return Dense(self.gin_channels, self.filter_channels * 2, init="xavier")

    def init_params(self, key):
        k1, k2, k3 = jax.random.split(key, 3)
        return {"conv_1": self._c1().init_params(k1),
                "conv_2": self._c2().init_params(k2),
                "cond": self._cond().init_params(k3)}

    def apply(self, p, x, x_mask=None, g=None, rng=None, train=False):
        f = self.filter_channels
        x = self._c1().apply(p["conv_1"], _mask(x, x_mask))  # see FFN note
        if train and self.p_dropout > 0 and rng is not None:
            x = drop_fn(rng, x, self.p_dropout, deterministic=False)
        gs = self._cond().apply(p["cond"], g)
        xa, xb = x[..., :f], x[..., f:]
        sa, sb = gs[:, None, :f], gs[:, None, f:]
        x = jnp.tanh(xa + sa) * jax.nn.sigmoid(xb + sb)
        x = self._c2().apply(p["conv_2"], _mask(x, x_mask))
        return _mask(x, x_mask)

    __call__ = apply


@dataclasses.dataclass(frozen=True)
class FFN3:
    """Additive-cond FFN (attentions.py:168-199)."""
    in_channels: int
    out_channels: int
    filter_channels: int
    kernel_size: int
    p_dropout: float = 0.0
    gin_channels: int = 0

    def _c1(self):
        return Conv1d(self.in_channels, self.filter_channels, self.kernel_size,
                      padding=self.kernel_size // 2, init="xavier")

    def _c2(self):
        return Conv1d(self.filter_channels, self.out_channels, self.kernel_size,
                      padding=self.kernel_size // 2, init="xavier")

    def _cond(self):
        return Dense(self.gin_channels, self.filter_channels, init="xavier")

    def init_params(self, key):
        k1, k2, k3 = jax.random.split(key, 3)
        return {"conv_1": self._c1().init_params(k1),
                "conv_2": self._c2().init_params(k2),
                "cond": self._cond().init_params(k3)}

    def apply(self, p, x, x_mask=None, g=None, rng=None, train=False):
        x = jax.nn.relu(self._c1().apply(p["conv_1"], _mask(x, x_mask)))  # see FFN note
        if train and self.p_dropout > 0 and rng is not None:
            x = drop_fn(rng, x, self.p_dropout, deterministic=False)
        gs = self._cond().apply(p["cond"], g)
        x = self._c2().apply(p["conv_2"], _mask(x + gs[:, None, :], x_mask))
        return _mask(x, x_mask)

    __call__ = apply


_FFNS = {"FFN": FFN, "FFN2": FFN2, "FFN3": FFN3}


@dataclasses.dataclass(frozen=True)
class Encoder:
    """Pre-built transformer stack (attentions.py:12-54): per layer
    self-attention + post-LN, then conditioned FFN + post-LN."""
    hidden_channels: int
    filter_channels: int
    n_heads: int
    n_layers: int
    kernel_size: int = 1
    p_dropout: float = 0.0
    ffn: str = "FFN2"
    gin_channels: int = 0

    def _attn(self):
        return MultiHeadAttention(self.hidden_channels, self.hidden_channels,
                                  self.n_heads, p_dropout=self.p_dropout)

    def _ffn(self):
        return _FFNS[self.ffn](self.hidden_channels, self.hidden_channels,
                               self.filter_channels, self.kernel_size,
                               p_dropout=self.p_dropout, gin_channels=self.gin_channels)

    def _ln(self):
        return LayerNorm(self.hidden_channels)

    def init_params(self, key):
        keys = jax.random.split(key, 4 * self.n_layers)
        p = {"attn_layers": {}, "norm_layers_1": {}, "ffn_layers": {}, "norm_layers_2": {}}
        for i in range(self.n_layers):
            p["attn_layers"][str(i)] = self._attn().init_params(keys[4 * i])
            p["norm_layers_1"][str(i)] = self._ln().init_params(keys[4 * i + 1])
            p["ffn_layers"][str(i)] = self._ffn().init_params(keys[4 * i + 2])
            p["norm_layers_2"][str(i)] = self._ln().init_params(keys[4 * i + 3])
        return p

    def apply(self, p, x, x_mask=None, g=None, rng=None, train=False):
        """x: (B, T, C); x_mask: (B, T, 1) or None; g: (B, gin)."""
        attn_mask = None
        if x_mask is not None:
            m = x_mask[..., 0]
            attn_mask = (m[:, None, :, None] * m[:, None, None, :])  # (B,1,T,T)
            x = x * x_mask
        for i in range(self.n_layers):
            si = str(i)
            if rng is not None:
                rng, r1, r2, r3, r4 = jax.random.split(rng, 5)
            else:
                r1 = r2 = r3 = r4 = None
            y = self._attn().apply(p["attn_layers"][si], x, x, attn_mask, rng=r1, train=train)
            if train and self.p_dropout > 0 and r2 is not None:
                y = drop_fn(r2, y, self.p_dropout, deterministic=False)
            x = self._ln().apply(p["norm_layers_1"][si], x + y)
            y = self._ffn().apply(p["ffn_layers"][si], x, x_mask, g=g, rng=r3, train=train)
            if train and self.p_dropout > 0 and r4 is not None:
                y = drop_fn(r4, y, self.p_dropout, deterministic=False)
            x = self._ln().apply(p["norm_layers_2"][si], x + y)
        return _mask(x, x_mask)

    __call__ = apply
