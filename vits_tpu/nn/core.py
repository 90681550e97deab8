"""Functional neural-net building blocks for TPU (channel-last layouts).

Design: every layer is a small stateless Python object holding only *static*
configuration. ``layer.init(key)`` returns a parameter pytree (nested dicts of
``jnp.ndarray``); ``layer.apply(params, x, ...)`` is a pure function. This keeps
parameters as plain pytrees (easy sharding/checkpointing) while letting model
code read naturally.

Layouts:
  * 1-D sequence tensors: ``(B, T, C)`` — channels on the TPU lane dimension.
  * Conv1d kernels: ``(K, C_in // groups, C_out)`` (lax 'WIO').
  * Conv2d inputs: ``(B, H, W, C)``; kernels ``(KH, KW, C_in, C_out)``.
  * Dense kernels: ``(C_in, C_out)``.

Weight normalization (reference: torch.nn.utils.weight_norm, used heavily in
emotional-vits modules.py/models.py/mrd.py) is represented by parameterizing a
kernel as ``{"g": (C_out,), "v": kernel}`` with
``w = g * v / ||v||_{all dims except C_out}``; ``fold_weight_norm`` collapses it
for inference (reference: SynthesizerTrn.remove_weight_norm, models.py:467-474).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from jax import lax

Params = Any


# ---------------------------------------------------------------------------
# initializers
# ---------------------------------------------------------------------------

def normal_init(key, shape, dtype=jnp.float32, mean=0.0, std=0.01):
    return mean + std * jax.random.normal(key, shape, dtype)


def xavier_uniform_init(key, shape, dtype=jnp.float32, fan_in=None, fan_out=None, gain=1.0):
    """Xavier/Glorot uniform. fan_in/fan_out default to torch semantics."""
    if fan_in is None or fan_out is None:
        if len(shape) == 2:  # dense (in, out)
            fan_in, fan_out = shape[0], shape[1]
        else:  # conv (K..., in, out)
            rf = 1
            for s in shape[:-2]:
                rf *= s
            fan_in, fan_out = shape[-2] * rf, shape[-1] * rf
    a = gain * math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -a, a)


def kaiming_uniform_init(key, shape, dtype=jnp.float32):
    """torch's default conv/linear init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))
    with a=sqrt(5) leaky-relu gain — net bound sqrt(1/fan_in)... computed
    exactly as torch does."""
    if len(shape) == 2:
        fan_in = shape[0]
    else:
        rf = 1
        for s in shape[:-2]:
            rf *= s
        fan_in = shape[-2] * rf
    gain = math.sqrt(2.0 / (1.0 + 5.0))  # leaky_relu with a=sqrt(5)
    bound = gain * math.sqrt(3.0 / fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def uniform_bias_init(key, shape, fan_in, dtype=jnp.float32):
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(key, shape, dtype, -bound, bound)


# ---------------------------------------------------------------------------
# weight norm
# ---------------------------------------------------------------------------

def _wn_axes(v, g):
    """Axes to norm over: all axes where g is singleton (g.ndim == v.ndim), or
    all-but-last when g is 1-D (the standard conv/dense case, torch dim=0 on a
    (C_out, ...) tensor == our trailing C_out)."""
    if g.ndim == 1:
        return tuple(range(v.ndim - 1))
    return tuple(i for i in range(v.ndim) if g.shape[i] == 1)


def wn_kernel(p):
    """Materialize a kernel from weight-norm {"g","v"}, spectral-norm
    {"w_orig","u"}, or plain {"w"} parameterizations."""
    if "v" in p:
        v, g = p["v"], p["g"]
        norm = jnp.sqrt(jnp.sum(jnp.square(v), axis=_wn_axes(v, g), keepdims=True))
        return g * v / norm
    if "w_orig" in p:
        return _sn_kernel(p["w_orig"], p["u"])
    return p["w"]


def _sn_kernel(kernel, u, eps=1e-12):
    """Spectral normalization forward (one power-iteration step from the
    persistent u buffer, torch semantics: u/v treated as constants)."""
    w = jnp.moveaxis(kernel, -1, 0).reshape(kernel.shape[-1], -1)
    u = jax.lax.stop_gradient(u)
    v = w.T @ u
    v = jax.lax.stop_gradient(v / (jnp.linalg.norm(v) + eps))
    u2 = w @ v
    u2 = jax.lax.stop_gradient(u2 / (jnp.linalg.norm(u2) + eps))
    sigma = u2 @ (w @ v)
    return kernel / sigma


def sn_update(params):
    """Recursively advance every spectral-norm u buffer by one power
    iteration (the stateful half of torch's per-forward update). Call once
    per discriminator train step, outside the grad."""
    if isinstance(params, dict):
        if "w_orig" in params:
            out = dict(params)
            _, u = spectral_normalize(params["w_orig"], params["u"])
            out["u"] = u
            return out
        return {k: sn_update(v) for k, v in params.items()}
    if isinstance(params, (list, tuple)):
        return type(params)(sn_update(v) for v in params)
    return params


def make_spectral_norm(kernel, key):
    u = jax.random.normal(key, (kernel.shape[-1],))
    return {"w_orig": kernel, "u": u / (jnp.linalg.norm(u) + 1e-12)}


def make_weight_norm(kernel, dim=-1):
    """Split a plain kernel into weight-norm (g, v). dim: axis indexed by g
    (torch weight_norm dim=0 == our -1 for conv/dense kernels; ConvTranspose1d
    keeps torch dim=0 == our axis 1 of (K, C_in, C_out))."""
    if dim in (-1, kernel.ndim - 1):
        axes = tuple(range(kernel.ndim - 1))
        g = jnp.sqrt(jnp.sum(jnp.square(kernel), axis=axes)).reshape(-1)
    else:
        axes = tuple(i for i in range(kernel.ndim) if i != dim)
        g = jnp.sqrt(jnp.sum(jnp.square(kernel), axis=axes, keepdims=True))
    return {"g": g, "v": kernel}


def fold_weight_norm(params):
    """Recursively fold every {"g","v"} pair into a plain "w" kernel."""
    if isinstance(params, dict):
        if "v" in params and "g" in params:
            out = {k: v for k, v in params.items() if k not in ("v", "g")}
            out["w"] = wn_kernel(params)
            return out
        return {k: fold_weight_norm(v) for k, v in params.items()}
    if isinstance(params, (list, tuple)):
        return type(params)(fold_weight_norm(v) for v in params)
    return params


# ---------------------------------------------------------------------------
# spectral norm (discriminators; reference mrd.py uses spectral_norm default)
# ---------------------------------------------------------------------------

def spectral_normalize(kernel, u, n_iters=1, eps=1e-12):
    """One power-iteration step of spectral normalization.

    kernel: any shape; flattened to (C_out, -1) like torch (dim=0 on a
    torch-layout (C_out, ...) tensor). Our kernels are (..., C_out) so we move
    C_out first before flattening to match torch's singular value estimate.

    Returns (w_sn, u_new). u is a persistent buffer threaded functionally.
    """
    w = jnp.moveaxis(kernel, -1, 0).reshape(kernel.shape[-1], -1)
    v = w.T @ u
    v = v / (jnp.linalg.norm(v) + eps)
    u_new = w @ v
    u_new = u_new / (jnp.linalg.norm(u_new) + eps)
    sigma = u_new @ (w @ v)
    return kernel / sigma, u_new


# ---------------------------------------------------------------------------
# layers
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class Dense:
    in_features: int
    out_features: int
    bias: bool = True
    weight_norm: bool = False
    init: str = "torch"  # torch | xavier | normal

    def init_params(self, key):
        kw, kb = jax.random.split(key)
        shape = (self.in_features, self.out_features)
        if self.init == "xavier":
            w = xavier_uniform_init(kw, shape)
        elif self.init == "normal":
            w = normal_init(kw, shape)
        else:
            w = kaiming_uniform_init(kw, shape)
        p = make_weight_norm(w) if self.weight_norm else {"w": w}
        if self.bias:
            p["b"] = uniform_bias_init(kb, (self.out_features,), self.in_features)
        return p

    def apply(self, p, x):
        w = wn_kernel(p)
        y = jnp.dot(x, w, preferred_element_type=x.dtype)
        if self.bias:
            y = y + p["b"]
        return y

    __call__ = apply


_DN1 = ("NWC", "WIO", "NWC")
_DN2 = ("NHWC", "HWIO", "NHWC")


@dataclasses.dataclass(frozen=True)
class Conv1d:
    in_channels: int
    out_channels: int
    kernel_size: int
    stride: int = 1
    padding: Union[int, str] = 0  # int (both sides) | 'VALID'
    dilation: int = 1
    groups: int = 1
    bias: bool = True
    weight_norm: bool = False
    spectral_norm: bool = False
    init: str = "torch"
    init_gain: float = 1.0

    def init_params(self, key):
        kw, kb = jax.random.split(key)
        shape = (self.kernel_size, self.in_channels // self.groups, self.out_channels)
        if self.init == "xavier":
            w = xavier_uniform_init(kw, shape, gain=self.init_gain)
        elif self.init == "normal":
            w = normal_init(kw, shape)
        else:
            w = kaiming_uniform_init(kw, shape)
        if self.weight_norm:
            p = make_weight_norm(w)
        elif self.spectral_norm:
            p = make_spectral_norm(w, kb)
        else:
            p = {"w": w}
        if self.bias:
            fan_in = (self.in_channels // self.groups) * self.kernel_size
            p["b"] = uniform_bias_init(kb, (self.out_channels,), fan_in)
        return p

    def apply(self, p, x):
        w = wn_kernel(p)
        if isinstance(self.padding, str):
            pad = self.padding
        else:
            pad = [(self.padding, self.padding)]
        y = lax.conv_general_dilated(
            x, w, (self.stride,), pad,
            rhs_dilation=(self.dilation,),
            dimension_numbers=_DN1,
            feature_group_count=self.groups,
        )
        if self.bias:
            y = y + p["b"]
        return y

    __call__ = apply


@dataclasses.dataclass(frozen=True)
class ConvTranspose1d:
    """Matches torch.nn.ConvTranspose1d(in, out, k, stride, padding).

    Output length: (T-1)*stride - 2*padding + kernel_size.
    Implemented as an input-dilated (fractionally-strided) conv:
    lhs_dilation=stride, spatial-flipped kernel, edge padding (k-1-p).
    Kernel stored as (K, C_out, C_in) ('WIO' with I=C_out after flip/transpose
    is handled in apply) — we store it as the *forward-conv* layout (K, C_in,
    C_out) and flip/transpose at apply time so the checkpoint bridge stays
    mechanical.
    """
    in_channels: int
    out_channels: int
    kernel_size: int
    stride: int
    padding: int = 0
    bias: bool = True
    weight_norm: bool = False
    init: str = "torch"
    subpixel: bool = True  # MXU-dense phase-packed path (see apply)

    def init_params(self, key):
        kw, kb = jax.random.split(key)
        shape = (self.kernel_size, self.in_channels, self.out_channels)
        if self.init == "normal":
            w = normal_init(kw, shape)
        else:
            # torch fan_in for ConvTranspose is in_channels*k? torch uses
            # weight shape (in, out, k) and computes fan_in = out*k. Replicate.
            gain = math.sqrt(2.0 / 6.0)
            bound = gain * math.sqrt(3.0 / (self.out_channels * self.kernel_size))
            w = jax.random.uniform(kw, shape, jnp.float32, -bound, bound)
        p = make_weight_norm(w, dim=1) if self.weight_norm else {"w": w}
        if self.bias:
            p["b"] = uniform_bias_init(kb, (self.out_channels,), self.out_channels * self.kernel_size)
        return p

    def apply(self, p, x):
        w = wn_kernel(p)  # (K, C_in, C_out)
        if self.subpixel and self.stride > 1:
            return self._apply_subpixel(p, x, w)
        w = jnp.flip(w, axis=0)
        edge = self.kernel_size - 1 - self.padding
        y = lax.conv_general_dilated(
            x, w, (1,), [(edge, edge)],
            lhs_dilation=(self.stride,),
            dimension_numbers=_DN1,
        )
        if self.bias:
            y = y + p["b"]
        return y

    def _apply_subpixel(self, p, x, w):
        """Phase-packed (subpixel / depth-to-space) transposed conv.

        The lhs_dilation lowering multiplies (stride-1)/stride structural
        zeros on the MXU. Instead: y[m*u + r] = Σ_j x[m-j]·w[j*u + r + pad],
        so each output phase r is an ordinary small conv over x. Pack all u
        phases into one dense conv with C_out·u output features and
        depth-to-space the result — identical numerics, ~u·K/(J·u) fewer
        MACs (J = Σ taps ≈ K/u + 1), and a plain 'WIO' conv XLA tiles
        straight onto the MXU.
        """
        K, u, pad = self.kernel_size, self.stride, self.padding
        C_in, C_out = self.in_channels, self.out_channels
        T = x.shape[1]
        L = (T - 1) * u - 2 * pad + K  # torch output length
        jmin = -((u - 1 + pad) // u)  # ceil((-(u-1) - pad)/u)
        jmax = (K - 1 - pad) // u
        J = jmax - jmin + 1
        M = -(-L // u)  # conv output frames needed to cover L samples
        # Wsub[a, :, r*C_out + co] = w[(jmin + J-1-a)*u + r + pad, :, co]
        # (flip in a baked in so a plain conv indexes x[m - j]).
        taps = (jnp.arange(J)[::-1] + jmin)[:, None] * u + jnp.arange(u)[None, :] + pad  # (J, u)
        valid = (taps >= 0) & (taps < K)
        gathered = w[jnp.clip(taps, 0, K - 1)]  # (J, u, C_in, C_out)
        gathered = jnp.where(valid[..., None, None], gathered, 0.0).astype(w.dtype)
        wsub = jnp.transpose(gathered, (0, 2, 1, 3)).reshape(J, C_in, u * C_out)
        pad_l = jmax
        pad_r = M - T - jmin
        y = lax.conv_general_dilated(
            x, wsub, (1,), [(pad_l, pad_r)], dimension_numbers=_DN1)
        y = y.reshape(y.shape[0], M * u, C_out)[:, :L]
        if self.bias:
            y = y + p["b"]
        return y

    __call__ = apply


@dataclasses.dataclass(frozen=True)
class Conv2d:
    in_channels: int
    out_channels: int
    kernel_size: Tuple[int, int]
    stride: Tuple[int, int] = (1, 1)
    padding: Union[Tuple[int, int], str] = (0, 0)
    bias: bool = True
    weight_norm: bool = False
    spectral_norm: bool = False
    init: str = "torch"
    init_gain: float = 1.0

    def init_params(self, key):
        kw, kb = jax.random.split(key)
        kh, kwd = self.kernel_size
        shape = (kh, kwd, self.in_channels, self.out_channels)
        if self.init == "xavier":
            w = xavier_uniform_init(kw, shape, gain=self.init_gain)
        elif self.init == "normal":
            w = normal_init(kw, shape)
        else:
            w = kaiming_uniform_init(kw, shape)
        if self.weight_norm:
            p = make_weight_norm(w)
        elif self.spectral_norm:
            p = make_spectral_norm(w, kb)
        else:
            p = {"w": w}
        if self.bias:
            fan_in = self.in_channels * kh * kwd
            p["b"] = uniform_bias_init(kb, (self.out_channels,), fan_in)
        return p

    def apply(self, p, x):
        w = wn_kernel(p)
        if isinstance(self.padding, str):
            pad = self.padding
        else:
            pad = [(self.padding[0], self.padding[0]), (self.padding[1], self.padding[1])]
        y = lax.conv_general_dilated(
            x, w, self.stride, pad, dimension_numbers=_DN2,
        )
        if self.bias:
            y = y + p["b"]
        return y

    __call__ = apply


@dataclasses.dataclass(frozen=True)
class Embedding:
    num_embeddings: int
    features: int

    def init_params(self, key):
        # distinct leaf name: torch Embedding.weight is (n, d) and must NOT get
        # the Linear transpose in the checkpoint bridge
        return {"embedding": jax.random.normal(key, (self.num_embeddings, self.features))}

    def apply(self, p, ids):
        return jnp.take(p["embedding"], ids, axis=0)

    __call__ = apply


@dataclasses.dataclass(frozen=True)
class LayerNorm:
    """LayerNorm over the last (channel) axis. Reference: modules.LayerNorm
    (modules.py:33-44) transposes to apply torch LN over channels; our
    channel-last layout needs no transpose."""
    channels: int
    eps: float = 1e-5

    def init_params(self, key):
        del key
        return {"gamma": jnp.ones((self.channels,)), "beta": jnp.zeros((self.channels,))}

    def apply(self, p, x):
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
        y = (x - mean) * lax.rsqrt(var + self.eps)
        return y * p["gamma"] + p["beta"]

    __call__ = apply


def dropout(key, x, rate, deterministic):
    """Inverted dropout; no-op when deterministic or rate == 0."""
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


def leaky_relu(x, slope=0.1):
    return jnp.where(x >= 0, x, x * slope)
