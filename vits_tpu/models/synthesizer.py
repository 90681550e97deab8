"""The VITS synthesizer: text encoder, duration predictor, posterior encoder,
coupling flows, HiFi-GAN decoder, and the assembled training/inference graphs.

Capability parity with the reference models.py (TextEncoder:103-189,
DurationPredictor:20-67, DurationDiscriminator:70-100, PosteriorEncoder:238-279,
ResidualCouplingBlock:192-235, Generator:282-318, SynthesizerTrn:411-575),
re-designed TPU-first:

  * channel-last (B, T, C); alignment expansion is a single einsum;
  * one masked implementation per block — padded static shapes + masks replace
    the reference's separate mask-free `infer()` methods; the decoder takes an
    optional frame mask that is upsampled per stage so bucketed-padded
    inference is bit-consistent with exact-length inference;
  * MAS runs on-chip (vits_tpu.ops.mas) instead of a host Cython round-trip;
  * the annealed alignment noise schedule (models.py:491-495 mutates a Python
    attribute — jit-hostile) is an explicit `align_noise` scalar argument
    computed from the step counter;
  * all sampling takes explicit PRNG keys.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from vits_tpu.nn.core import Conv1d, ConvTranspose1d, Dense, Embedding, LayerNorm, dropout as drop_fn, leaky_relu
from vits_tpu.nn.packed import (
    conv1d_packed,
    conv_transpose1d_packed,
    mask_packed,
    repack,
    unpack,
)
from vits_tpu.nn import quant as Q
from vits_tpu.nn.core import wn_kernel
from vits_tpu.models import attentions
from vits_tpu.models.modules import (
    LRELU_SLOPE,
    ResBlock1,
    ResBlock2,
    ResidualCouplingLayer,
    Swish,
    WN,
    flip_channels,
)
from vits_tpu.ops import mas
from vits_tpu.ops.seq import generate_path, rand_slice_segments, sequence_mask


def _mask(x, m):
    return x if m is None else x * m


# ---------------------------------------------------------------------------
# Duration predictor (deterministic — the fork dropped the stochastic DP)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class DurationPredictor:
    """models.DurationPredictor (models.py:20-67): conv→act→LN→dropout ×2 with
    two speaker-conditioning Linear adds; inputs are gradient-detached."""
    in_channels: int
    filter_channels: int
    kernel_size: int = 5
    p_dropout: float = 0.25
    act_func: str = "ReLU"
    gin_channels: int = 0

    def _act_params(self):
        return Swish() if self.act_func.lower() == "swish" else None

    def init_params(self, key):
        ks = jax.random.split(key, 9)
        f = self.filter_channels
        p = {
            "pre": Conv1d(self.in_channels, f, 1).init_params(ks[0]),
            "conv_1": Conv1d(f, f, self.kernel_size, padding=self.kernel_size // 2).init_params(ks[1]),
            "norm_1": LayerNorm(f).init_params(ks[2]),
            "conv_2": Conv1d(f, f, self.kernel_size, padding=self.kernel_size // 2).init_params(ks[3]),
            "norm_2": LayerNorm(f).init_params(ks[4]),
            "proj": Conv1d(f, 1, 1).init_params(ks[5]),
            "cond1": Dense(self.gin_channels, f).init_params(ks[6]),
            "cond2": Dense(self.gin_channels, f).init_params(ks[7]),
        }
        sw = self._act_params()
        if sw is not None:
            p["act_1"] = sw.init_params(ks[8])
            p["act_2"] = sw.init_params(ks[8])
        return p

    def _act(self, p, name, x):
        if self.act_func.lower() == "swish":
            return Swish().apply(p[name], x)
        if self.act_func.lower() == "relu":
            return jax.nn.relu(x)
        raise ValueError(f"unsupported act_func {self.act_func}")

    def apply(self, p, x, x_mask=None, g=None, rng=None, train=False):
        f = self.filter_channels
        k = self.kernel_size
        if train:
            x = jax.lax.stop_gradient(x)
            g = jax.lax.stop_gradient(g)
        x = Conv1d(self.in_channels, f, 1).apply(p["pre"], x) \
            + Dense(self.gin_channels, f).apply(p["cond1"], g)[:, None, :]
        x = Conv1d(f, f, k, padding=k // 2).apply(p["conv_1"], _mask(x, x_mask))
        x = LayerNorm(f).apply(p["norm_1"], self._act(p, "act_1", x))
        if train and rng is not None:
            rng, sub = jax.random.split(rng)
            x = drop_fn(sub, x, self.p_dropout, deterministic=False)
        x = x + Dense(self.gin_channels, f).apply(p["cond2"], g)[:, None, :]
        x = Conv1d(f, f, k, padding=k // 2).apply(p["conv_2"], _mask(x, x_mask))
        x = LayerNorm(f).apply(p["norm_2"], self._act(p, "act_2", x))
        if train and rng is not None:
            x = drop_fn(rng, x, self.p_dropout, deterministic=False)
        x = Conv1d(f, 1, 1).apply(p["proj"], _mask(x, x_mask))
        return _mask(x, x_mask)  # (B, T, 1) log-durations

    __call__ = apply


@dataclasses.dataclass(frozen=True)
class DurationDiscriminator:
    """Optional adversarial duration critic (models.py:70-100, `-d` flag)."""
    in_channels: int
    filter_channels: int = 128
    kernel_size: int = 5

    def init_params(self, key):
        ks = jax.random.split(key, 7)
        f, k = self.filter_channels, self.kernel_size
        return {
            "pre_x": Conv1d(self.in_channels, f, 1, weight_norm=True).init_params(ks[0]),
            "pre_d": Conv1d(1, f, 1, weight_norm=True).init_params(ks[1]),
            "convs": {
                "0": Conv1d(2 * f, f, k, padding=k // 2, weight_norm=True).init_params(ks[2]),
                "1": Conv1d(f, f, k, padding=k // 2, weight_norm=True).init_params(ks[3]),
                "2": Conv1d(f, f, k, padding=k // 2, weight_norm=True).init_params(ks[4]),
                "3": Conv1d(f, f, k, padding=k // 2, weight_norm=True).init_params(ks[5]),
            },
            "out": Conv1d(f, 1, 1).init_params(ks[6]),
        }

    def _score(self, p, x, x_mask, d):
        f, k = self.filter_channels, self.kernel_size
        d = Conv1d(1, f, 1, weight_norm=True).apply(p["pre_d"], d)
        h = jnp.concatenate([x, d], axis=-1)
        convs = [Conv1d(2 * f, f, k, padding=k // 2, weight_norm=True)] + \
                [Conv1d(f, f, k, padding=k // 2, weight_norm=True)] * 3
        for i, conv in enumerate(convs):
            h = conv.apply(p["convs"][str(i)], _mask(h, x_mask))
            h = leaky_relu(h, 0.1)
        h = Conv1d(f, 1, 1).apply(p["out"], _mask(h, x_mask))
        return _mask(h, x_mask)

    def apply(self, p, x, x_mask, d_real, d_fake):
        x = jax.lax.stop_gradient(x)
        x = Conv1d(self.in_channels, self.filter_channels, 1, weight_norm=True).apply(p["pre_x"], x)
        out_r = self._score(p, x, x_mask, d_real)
        out_g = self._score(p, x, x_mask, d_fake)
        return [out_r], [out_g]

    __call__ = apply


# ---------------------------------------------------------------------------
# Text encoder
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class TextEncoder:
    """models.TextEncoder (models.py:103-189): Linear+LN embedding of dense
    float text vectors (not token ids), 1024-d emotion projection, learned-α
    sinusoidal PE (table 384), transformer stack, conv proj to (m, logs)."""
    in_channels: int
    out_channels: int
    hidden_channels: int
    filter_channels: int
    n_heads: int
    n_layers: int
    kernel_size: int
    p_dropout: float
    ffn: str = "FFN2"
    gin_channels: int = 0
    max_pos: int = 256 + 128

    def _encoder(self):
        return attentions.Encoder(self.hidden_channels, self.filter_channels,
                                  self.n_heads, self.n_layers, self.kernel_size,
                                  self.p_dropout, ffn=self.ffn,
                                  gin_channels=self.gin_channels)

    def init_params(self, key):
        ks = jax.random.split(key, 5)
        h = self.hidden_channels
        return {
            "emb": {"0": Dense(self.in_channels, h).init_params(ks[0]),
                    "1": LayerNorm(h).init_params(ks[1])},
            "emo_proj": Dense(1024, h, init="xavier").init_params(ks[2]),
            # Strong-typed f32: a weak-typed scalar would change the jit
            # signature after the first optimizer update (→ full recompile).
            "alpha": jnp.array(1.0, dtype=jnp.float32),
            "encoder": self._encoder().init_params(ks[3]),
            "proj": Conv1d(h, self.out_channels * 2, 1, init="xavier").init_params(ks[4]),
        }

    def apply(self, p, x, x_mask=None, emo=None, g=None, rng=None, train=False):
        """x: (B, T, in); emo: (B, 1024); g: (B, gin). Returns
        (hidden (B,T,h), m (B,T,out), logs (B,T,out))."""
        h = self.hidden_channels
        T = x.shape[1]
        x = Dense(self.in_channels, h).apply(p["emb"]["0"], x)
        x = LayerNorm(h).apply(p["emb"]["1"], x)
        x = x + Dense(1024, h).apply(p["emo_proj"], emo)[:, None, :]
        from vits_tpu.ops.seq import gen_sin_table
        pe = gen_sin_table(max(self.max_pos, T), h)[:, :T].astype(x.dtype)
        x = x * math.sqrt(h) + pe * p["alpha"]
        x = self._encoder().apply(p["encoder"], x, x_mask, g=g, rng=rng, train=train)
        stats = _mask(Conv1d(h, self.out_channels * 2, 1).apply(p["proj"], x), x_mask)
        m, logs = stats[..., :self.out_channels], stats[..., self.out_channels:]
        return x, m, logs

    __call__ = apply


# ---------------------------------------------------------------------------
# Posterior encoder
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class PosteriorEncoder:
    """models.PosteriorEncoder (models.py:238-279). Note gin_channels=0 in the
    assembled model — the posterior is speaker-independent (models.py:461)."""
    in_channels: int
    out_channels: int
    hidden_channels: int
    kernel_size: int
    dilation_rate: int
    n_layers: int
    gin_channels: int = 0

    def _enc(self):
        return WN(self.hidden_channels, self.kernel_size, self.dilation_rate,
                  self.n_layers, gin_channels=self.gin_channels)

    def init_params(self, key):
        ks = jax.random.split(key, 4)
        h = self.hidden_channels
        return {
            "pre": {"0": Conv1d(self.in_channels, h, 1).init_params(ks[0]),
                    "1": LayerNorm(h).init_params(ks[1])},
            "enc": self._enc().init_params(ks[2]),
            "proj": Conv1d(h, self.out_channels * 2, 1).init_params(ks[3]),
        }

    def stats(self, p, x, x_mask=None, g=None):
        h = self.hidden_channels
        x = Conv1d(self.in_channels, h, 1).apply(p["pre"]["0"], x)
        x = _mask(LayerNorm(h).apply(p["pre"]["1"], x), x_mask)
        x = self._enc().apply(p["enc"], x, x_mask, g=g)
        stats = _mask(Conv1d(h, self.out_channels * 2, 1).apply(p["proj"], x), x_mask)
        return stats[..., :self.out_channels], stats[..., self.out_channels:]

    def apply(self, p, x, x_mask=None, g=None, rng=None):
        m, logs = self.stats(p, x, x_mask, g)
        noise = jax.random.normal(rng, m.shape, m.dtype) if rng is not None else 0.0
        z = _mask(m + noise * jnp.exp(logs), x_mask)
        return z, m, logs

    __call__ = apply


# ---------------------------------------------------------------------------
# Flow block
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class ResidualCouplingBlock:
    """models.ResidualCouplingBlock (models.py:192-235): n_flows ×
    (mean-only coupling + channel flip), per-flow dilation list."""
    channels: int
    hidden_channels: int
    kernel_size: int
    dilation_rate: Tuple[int, ...]
    n_layers: int
    n_flows: int = 4
    gin_channels: int = 0

    def _flow(self, i):
        return ResidualCouplingLayer(self.channels, self.hidden_channels,
                                     self.kernel_size, self.dilation_rate[i],
                                     self.n_layers, gin_channels=self.gin_channels,
                                     mean_only=True)

    def init_params(self, key):
        keys = jax.random.split(key, self.n_flows)
        # torch ModuleList interleaves couplings and Flips: indices 0,2,4,...
        return {"flows": {str(2 * i): self._flow(i).init_params(keys[i])
                          for i in range(self.n_flows)}}

    def apply(self, p, x, x_mask=None, g=None, reverse=False):
        order = range(self.n_flows) if not reverse else reversed(range(self.n_flows))
        for i in order:
            if not reverse:
                x, _ = self._flow(i).apply(p["flows"][str(2 * i)], x, x_mask, g=g, reverse=False)
                x = flip_channels(x)
            else:
                x = flip_channels(x)
                x = self._flow(i).apply(p["flows"][str(2 * i)], x, x_mask, g=g, reverse=True)
        return x

    __call__ = apply


# ---------------------------------------------------------------------------
# HiFi-GAN decoder
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class Generator:
    """models.Generator (models.py:282-318): conv_pre(7) → per-stage
    [lrelu → weight-norm ConvTranspose upsample → mean of resblocks] →
    lrelu → conv_post(7, bias-free) → tanh. Speaker conditioning enters every
    resblock (fork-specific, unlike stock HiFi-GAN)."""
    initial_channel: int
    resblock: str
    resblock_kernel_sizes: Tuple[int, ...]
    resblock_dilation_sizes: Tuple[Tuple[int, ...], ...]
    upsample_rates: Tuple[int, ...]
    upsample_initial_channel: int
    upsample_kernel_sizes: Tuple[int, ...]
    gin_channels: int = 0

    @property
    def num_kernels(self):
        return len(self.resblock_kernel_sizes)

    @property
    def num_upsamples(self):
        return len(self.upsample_rates)

    def _up(self, i):
        u, k = self.upsample_rates[i], self.upsample_kernel_sizes[i]
        cin = self.upsample_initial_channel // (2 ** i)
        cout = self.upsample_initial_channel // (2 ** (i + 1))
        return ConvTranspose1d(cin, cout, k, u, padding=(k - u) // 2, weight_norm=True)

    def _resblock(self, i, j):
        ch = self.upsample_initial_channel // (2 ** (i + 1))
        cls = ResBlock1 if self.resblock == "1" else ResBlock2
        return cls(ch, self.resblock_kernel_sizes[j],
                   tuple(self.resblock_dilation_sizes[j]), self.gin_channels)

    def init_params(self, key):
        n_rb = self.num_upsamples * self.num_kernels
        ks = jax.random.split(key, 2 + self.num_upsamples + n_rb)
        ch_last = self.upsample_initial_channel // (2 ** self.num_upsamples)
        p = {
            "conv_pre": Conv1d(self.initial_channel, self.upsample_initial_channel, 7,
                               padding=3).init_params(ks[0]),
            "ups": {str(i): self._up(i).init_params(ks[2 + i])
                    for i in range(self.num_upsamples)},
            "resblocks": {},
            "conv_post": Conv1d(ch_last, 1, 7, padding=3, bias=False).init_params(ks[1]),
        }
        for i in range(self.num_upsamples):
            for j in range(self.num_kernels):
                idx = i * self.num_kernels + j
                p["resblocks"][str(idx)] = self._resblock(i, j).init_params(ks[2 + self.num_upsamples + idx])
        return p

    def _pack_schedule(self):
        """Per-stage phase packing p_i so the late small-channel stages run
        at p_i*C_i == 128 lanes (nn.packed). p_i must divide p_{i-1}*u_i
        (pack transitions are contiguous reshapes) and the upsample must be
        length-preserving (k == 2*pad + u) for the packed transposed conv."""
        packs = []
        p_prev = 1
        for i in range(self.num_upsamples):
            u, k = self.upsample_rates[i], self.upsample_kernel_sizes[i]
            c_out = self.upsample_initial_channel // (2 ** (i + 1))
            if k != 2 * ((k - u) // 2) + u:  # packed transpose unsupported
                packs.append(1)
                p_prev = 1
                continue
            nat = p_prev * u
            want = max(1, min(nat, 128 // c_out))
            while nat % want:
                want -= 1
            packs.append(want)
            p_prev = want
        return tuple(packs)

    def apply(self, p, x, g=None, x_mask=None, packed=True, record=None, q8=False,
              stages=None, q8_pallas=False):
        """x: (B, T, initial); optional frame mask (B, T, 1) upsampled per
        stage so padded inference == exact-length inference. Returns
        (B, T * prod(rates), 1) waveform in (-1, 1).

        packed=True keeps small-channel stages phase-packed at 128 lanes
        (identical numerics; see nn.packed). record: a dict to collect
        per-conv-input max-abs during a calibration pass (see calibrate).
        q8=True runs the full decoder conv stack in int8 — conv_pre, the
        length-preserving upsample transposed convs, the resblock convs, and
        conv_post (p must come from quantize; speaker-cond Dense stays
        float). stages=n runs only the first n upsample stages and returns
        the (possibly packed) intermediate — profiling hook
        (scripts/profile_infer*.py time per-stage prefixes of the REAL
        graph)."""
        if q8:
            packed = True  # quantized kernels are pre-packed per the schedule
        if record is not None:
            record["pre_in"] = Q.amax(x)
        if q8 and "pre_q8" in p:
            q = p["pre_q8"]
            fmin, fmax, rd = Q.conv_geometry(7, 1, 1, 3)
            x = Q.conv1d_q8(Q.quantize_act(x, q["s_in"]), q["w8"], fmin, fmax,
                            q["s_in"], q["s_w"], q["b"], out_dtype=x.dtype,
                            rhs_dilation=rd)
        else:
            x = Conv1d(self.initial_channel, self.upsample_initial_channel, 7, padding=3).apply(p["conv_pre"], x)
        m = x_mask
        packs = self._pack_schedule() if packed else (1,) * self.num_upsamples
        p_cur = 1
        for i in range(self.num_upsamples if stages is None else stages):
            x = leaky_relu(x, LRELU_SLOPE)
            p_i = packs[i]
            if m is not None:
                x = mask_packed(x, m, p_cur) if p_cur > 1 else x * m
                m = jnp.repeat(m, self.upsample_rates[i], axis=1)
            u, k = self.upsample_rates[i], self.upsample_kernel_sizes[i]
            if p_cur > 1 and k != 2 * ((k - u) // 2) + u:
                x = unpack(x, p_cur)  # transposed conv not length-preserving
                p_cur = 1
            if record is not None:
                record[f"up{i}_in"] = Q.amax(x)
            if q8 and str(i) in p.get("ups_q8", {}):
                q = p["ups_q8"][str(i)]
                fmin, fmax = Q.transposed_geometry(k, p_cur, u, (k - u) // 2)
                x = Q.conv1d_q8(Q.quantize_act(x, q["s_in"]), q["w8"], fmin, fmax,
                                q["s_in"], q["s_w"], q["b"], out_dtype=x.dtype)
                x = repack(x, p_cur * u, p_i)
            elif p_cur > 1 or p_i > 1:
                x = conv_transpose1d_packed(self._up(i), p["ups"][str(i)], x, p_cur)
                x = repack(x, p_cur * u, p_i)
            else:
                x = self._up(i).apply(p["ups"][str(i)], x)
            p_cur = p_i
            if m is not None:
                x = mask_packed(x, m, p_cur) if p_cur > 1 else x * m
            xs = 0.0
            for j in range(self.num_kernels):
                idx = i * self.num_kernels + j
                rb = self._resblock(i, j)
                if q8 and q8_pallas:
                    from vits_tpu.nn.pallas_rb import resblock2_chain_q8
                    xs = xs + resblock2_chain_q8(rb, p["resblocks"][str(idx)],
                                                 x, g, pack=p_cur, x_mask=m)
                elif q8:
                    xs = xs + rb.apply_q8(p["resblocks"][str(idx)], x, g, p_cur, x_mask=m)
                elif p_cur > 1:
                    xs = xs + rb.apply_packed(p["resblocks"][str(idx)], x, g, p_cur,
                                              x_mask=m, record=record, rec_prefix=f"rb{idx}_")
                else:
                    xs = xs + rb.apply(p["resblocks"][str(idx)], x, g, x_mask=m,
                                       record=record, rec_prefix=f"rb{idx}_")
            x = xs / self.num_kernels
        if stages is not None and stages < self.num_upsamples:
            return x  # profiling prefix: packed intermediate, no conv_post
        x = leaky_relu(x, 0.01)  # torch F.leaky_relu default slope (models.py:315)
        ch_last = self.upsample_initial_channel // (2 ** self.num_upsamples)
        post = Conv1d(ch_last, 1, 7, padding=3, bias=False)
        xm = mask_packed(x, m, p_cur) if p_cur > 1 else _mask(x, m)
        if record is not None:
            record["post_in"] = Q.amax(xm)
        if q8 and "post_q8" in p:
            q = p["post_q8"]
            fmin, fmax, rd = Q.conv_geometry(7, p_cur, 1, 3)
            x = Q.conv1d_q8(Q.quantize_act(xm, q["s_in"]), q["w8"], fmin, fmax,
                            q["s_in"], q["s_w"], None, out_dtype=xm.dtype,
                            rhs_dilation=rd)
            if p_cur > 1:
                x = unpack(x, p_cur)
        elif p_cur > 1:
            x = conv1d_packed(post, p["conv_post"], xm, p_cur)
            x = unpack(x, p_cur)
        else:
            x = post.apply(p["conv_post"], xm)
        return jnp.tanh(x)

    def calibrate(self, p, x, g=None, x_mask=None):
        """Run one float decode on representative inputs, recording the
        max-abs of every resblock conv input. Returns {point: scalar array}
        — feed to quantize(). The record dict is trace-compatible;
        quantize_decoder (and EmoVITS) jit this pass to avoid eager per-op
        dispatch."""
        record = {}
        self.apply(p, x, g=g, x_mask=x_mask, packed=True, record=record)
        return record

    def quantize(self, p, scales):
        """Post-training int8 quantization (nn.quant) of the full decoder:
        resblock convs, the upsample transposed convs (pre-packed dense
        phase-major form), and conv_pre/conv_post — per-output-channel int8
        weights, per-conv calibrated activation scales from a calibrate()
        run. Gates, residuals, and speaker conditioning stay in the float
        path. Analog of the reference's full-engine TRT INT8 deployment
        (toolkits/onnx2engine.py:13-58). Returns qparams for
        apply(..., q8=True)."""
        if self.resblock != "2":
            raise NotImplementedError("int8 decode implemented for ResBlock2 "
                                      "(the shipped configs' resblock)")
        packs = self._pack_schedule()
        qp = {"conv_pre": p["conv_pre"], "ups": p["ups"],
              "conv_post": p["conv_post"], "resblocks": {}, "ups_q8": {}}
        w8, s_w = Q.quantize_kernel(wn_kernel(p["conv_pre"]))
        qp["pre_q8"] = {"w8": w8, "s_w": s_w, "b": p["conv_pre"].get("b"),
                        "s_in": Q.act_scale(scales["pre_in"])}
        p_cur = 1
        for i in range(self.num_upsamples):
            u, k = self.upsample_rates[i], self.upsample_kernel_sizes[i]
            pad = (k - u) // 2
            if k != 2 * pad + u:
                p_cur = 1  # apply() unpacks and runs this stage in float
            else:
                w8, s_w = Q.pack_quantize_transposed_kernel(
                    wn_kernel(p["ups"][str(i)]), k, p_cur, u, pad)
                qp["ups_q8"][str(i)] = {
                    "w8": w8, "s_w": s_w,
                    "b": Q.tile_bias(p["ups"][str(i)].get("b"), p_cur * u),
                    "s_in": Q.act_scale(scales[f"up{i}_in"]),
                }
            p_cur = packs[i]
            for j in range(self.num_kernels):
                idx = i * self.num_kernels + j
                rb = self._resblock(i, j)
                qp["resblocks"][str(idx)] = rb.quantize_params(
                    p["resblocks"][str(idx)], scales, packs[i], prefix=f"rb{idx}_")
        p_last = packs[-1] if packs else 1
        w8, s_w, _, _, _ = Q.pack_quantize_kernel(
            wn_kernel(p["conv_post"]), 7, p_last, 1, 3)
        qp["post_q8"] = {"w8": w8, "s_w": s_w,
                         "s_in": Q.act_scale(scales["post_in"])}
        return qp

    __call__ = apply


# ---------------------------------------------------------------------------
# Assembled synthesizer
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class Synthesizer:
    """SynthesizerTrn equivalent (models.py:411-575)."""
    text_channels: int
    spec_channels: int
    segment_size: int  # in frames
    inter_channels: int
    hidden_channels: int
    filter_channels: int
    n_heads: int
    n_layers: int
    kernel_size: int
    p_dropout: float
    resblock_kernel_sizes: Tuple[int, ...]
    resblock_dilation_sizes: Tuple[Tuple[int, ...], ...]
    upsample_rates: Tuple[int, ...]
    upsample_initial_channel: int
    upsample_kernel_sizes: Tuple[int, ...]
    resblock: str = "2"
    ffn: str = "FFN2"
    kernel_size_q: int = 5
    n_layers_q: int = 16
    hidden_size_d: int = 256
    kernel_size_d: int = 5
    p_dropout_d: float = 0.5
    act_func_d: str = "ReLU"
    dilation_rate: Tuple[int, ...] = (1, 1, 1, 1)
    n_flows: int = 4
    n_speakers: int = 0
    gin_channels: int = 0

    @classmethod
    def from_hps(cls, hps):
        """Build from an HParams config (utils.get_hparams JSON schema)."""
        m = hps.model
        return cls(
            text_channels=hps.data.text_channels,
            spec_channels=hps.data.filter_length // 2 + 1,
            segment_size=hps.train.segment_size // hps.data.hop_length,
            inter_channels=m.inter_channels,
            hidden_channels=m.hidden_channels,
            filter_channels=m.filter_channels,
            n_heads=m.n_heads,
            n_layers=m.n_layers,
            kernel_size=m.kernel_size,
            p_dropout=m.p_dropout,
            resblock_kernel_sizes=tuple(m.resblock_kernel_sizes),
            resblock_dilation_sizes=tuple(tuple(d) for d in m.resblock_dilation_sizes),
            upsample_rates=tuple(m.upsample_rates),
            upsample_initial_channel=m.upsample_initial_channel,
            upsample_kernel_sizes=tuple(m.upsample_kernel_sizes),
            resblock=str(m.resblock),
            ffn=getattr(m, "ffn", "FFN2"),
            kernel_size_q=getattr(m, "kernel_size_q", 5),
            n_layers_q=getattr(m, "n_layers_q", 16),
            hidden_size_d=getattr(m, "hidden_size_d", 256),
            kernel_size_d=getattr(m, "kernel_size_d", 5),
            p_dropout_d=getattr(m, "p_dropout_d", 0.5),
            act_func_d=getattr(m, "act_func_d", "ReLU"),
            dilation_rate=tuple(getattr(m, "dilation_rate", (1, 1, 1, 1))),
            n_flows=getattr(m, "n_flows", 4),
            n_speakers=hps.data.n_speakers,
            gin_channels=m.gin_channels,
        )

    # sub-modules -----------------------------------------------------------
    @property
    def enc_p(self):
        return TextEncoder(self.text_channels, self.inter_channels,
                           self.hidden_channels, self.filter_channels,
                           self.n_heads, self.n_layers, self.kernel_size,
                           self.p_dropout, ffn=self.ffn,
                           gin_channels=self.gin_channels)

    @property
    def enc_q(self):
        return PosteriorEncoder(self.spec_channels, self.inter_channels,
                                self.hidden_channels, self.kernel_size_q, 1,
                                self.n_layers_q, gin_channels=0)

    @property
    def flow(self):
        return ResidualCouplingBlock(self.inter_channels, self.hidden_channels,
                                     5, self.dilation_rate, 4,
                                     n_flows=self.n_flows,
                                     gin_channels=self.gin_channels)

    @property
    def dp(self):
        return DurationPredictor(self.hidden_channels, self.hidden_size_d,
                                 self.kernel_size_d, p_dropout=self.p_dropout_d,
                                 act_func=self.act_func_d,
                                 gin_channels=self.gin_channels)

    @property
    def dec(self):
        return Generator(self.inter_channels, self.resblock,
                         self.resblock_kernel_sizes, self.resblock_dilation_sizes,
                         self.upsample_rates, self.upsample_initial_channel,
                         self.upsample_kernel_sizes, gin_channels=self.gin_channels)

    @property
    def emb_g(self):
        return Embedding(self.n_speakers, self.gin_channels)

    def init_params(self, key):
        ks = jax.random.split(key, 6)
        return {
            "dec": self.dec.init_params(ks[0]),
            "enc_p": self.enc_p.init_params(ks[1]),
            "enc_q": self.enc_q.init_params(ks[2]),
            "flow": self.flow.init_params(ks[3]),
            "dp": self.dp.init_params(ks[4]),
            "emb_g": self.emb_g.init_params(ks[5]),
        }

    # graphs ---------------------------------------------------------------
    def forward(self, p, rng, x, x_lengths, spec, spec_lengths, emo, sid,
                align_noise=0.0, mas_impl="auto", train=True):
        """Training graph (models.py:476-515).

        x: (B, T_x, text_channels); spec: (B, T_y, spec_channels);
        emo: (B, 1024); sid: (B,) int. Returns a dict of every tensor the
        training losses need.
        """
        r = dict(zip(
            ["encp", "postq", "noise_mas", "slice", "fwd", "dp"],
            jax.random.split(rng, 6)))
        g = self.emb_g.apply(p["emb_g"], sid)  # (B, gin)
        x_mask = sequence_mask(x_lengths, x.shape[1])[..., None].astype(x.dtype)
        y_mask = sequence_mask(spec_lengths, spec.shape[1])[..., None].astype(x.dtype)

        x_h, m_p, logs_p = self.enc_p.apply(p["enc_p"], x, x_mask, emo=emo, g=g,
                                            rng=r["encp"], train=train)
        z, m_q, logs_q = self.enc_q.apply(p["enc_q"], spec, y_mask, g=None, rng=r["postq"])
        z_p = self.flow.apply(p["flow"], z, y_mask, g=g, reverse=False)

        # --- MAS (no grad), models.py:483-498 ---
        sg = jax.lax.stop_gradient
        logs_p_, m_p_, z_p_ = sg(logs_p), sg(m_p), sg(z_p)
        s_p_sq_r = jnp.exp(-2.0 * logs_p_)  # (B, T_x, C)
        nc1 = jnp.sum(-0.5 * math.log(2 * math.pi) - logs_p_, axis=-1)  # (B, T_x)
        nc2 = jnp.einsum("byc,bxc->byx", -0.5 * jnp.square(z_p_), s_p_sq_r)
        nc3 = jnp.einsum("byc,bxc->byx", z_p_, m_p_ * s_p_sq_r)
        nc4 = jnp.sum(-0.5 * jnp.square(m_p_) * s_p_sq_r, axis=-1)  # (B, T_x)
        neg_cent = nc1[:, None, :] + nc2 + nc3 + nc4[:, None, :]
        noise_eps = jnp.std(neg_cent) * jax.random.normal(
            r["noise_mas"], neg_cent.shape, neg_cent.dtype) * align_noise
        neg_cent = neg_cent + noise_eps
        attn_mask = y_mask * jnp.swapaxes(x_mask, 1, 2)  # (B, T_y, T_x)
        attn = sg(mas.maximum_path(neg_cent, attn_mask, impl=mas_impl))

        # --- durations (models.py:500-503) ---
        w = jnp.sum(attn, axis=1)  # (B, T_x)
        logw_ = jnp.log(w + 1e-6)[..., None] * x_mask
        logw = self.dp.apply(p["dp"], x_h, x_mask, g=g, rng=r["dp"], train=train)
        l_length = jnp.sum(jnp.abs(logw - logw_), axis=(1, 2)) / jnp.sum(x_mask)

        # --- expand prior (models.py:506-507) ---
        m_p_e = jnp.einsum("byx,bxc->byc", attn, m_p)
        logs_p_e = jnp.einsum("byx,bxc->byc", attn, logs_p)

        z_slice, ids_slice = rand_slice_segments(r["slice"], z, spec_lengths, self.segment_size)
        o = self.dec.apply(p["dec"], z_slice, g=g)

        # --- forward-consistency branch (models.py:513, fork-specific) ---
        eps = jax.random.normal(r["fwd"], m_p_e.shape, m_p_e.dtype)
        z_q = self.flow.apply(p["flow"], m_p_e + eps * jnp.exp(logs_p_e), y_mask, g=g, reverse=True)

        return {
            "y_hat": o, "l_length": l_length, "attn": attn, "ids_slice": ids_slice,
            "x_mask": x_mask, "y_mask": y_mask,
            "z": z, "z_p": z_p, "m_p": m_p_e, "logs_p": logs_p_e,
            "m_q": m_q, "logs_q": logs_q, "z_q": z_q,
            "x_hidden": x_h, "logw_": sg(logw_), "logw": logw,
        }

    def inference(self, p, rng, x, x_lengths, emo, sid, noise_scale=1.0,
                  length_scale=1.0, max_frames=1000, noise=None, dec_q8=None):
        """Batched eval path (models.py:517-535) with a static output cap.

        noise: optional PRE-SCALED prior noise (B, max_frames, inter) — the
        serving path passes a slice of its reference-style pre-sampled ring
        (infer.py:69) so the fused single-dispatch graph keeps noise-ring
        character; when None, noise is drawn from `rng` and scaled by
        noise_scale. dec_q8: optional int8 decoder params (Generator.quantize)
        — the fused+int8 serving mode."""
        g = self.emb_g.apply(p["emb_g"], sid)
        x_mask = sequence_mask(x_lengths, x.shape[1])[..., None].astype(x.dtype)
        x_h, m_p, logs_p = self.enc_p.apply(p["enc_p"], x, x_mask, emo=emo, g=g)
        logw = self.dp.apply(p["dp"], x_h, x_mask, g=g)
        w = jnp.exp(logw) * x_mask * length_scale
        w_ceil = jnp.ceil(w)[..., 0]  # (B, T_x)
        y_lengths = jnp.clip(jnp.sum(w_ceil, axis=-1), min=1.0).astype(jnp.int32)
        y_lengths = jnp.minimum(y_lengths, max_frames)
        y_mask = sequence_mask(y_lengths, max_frames)[..., None].astype(x.dtype)
        attn_mask = y_mask * jnp.swapaxes(x_mask, 1, 2)
        # scalars may arrive as fp32 arrays; keep the graph in the compute
        # dtype (a promoted fp32 attn/z_p would poison the flow + decoder)
        attn = generate_path(w_ceil, attn_mask).astype(x.dtype)
        m_p_e = jnp.einsum("byx,bxc->byc", attn, m_p)
        logs_p_e = jnp.einsum("byx,bxc->byc", attn, logs_p)
        if noise is None:
            noise = jax.random.normal(rng, m_p_e.shape, m_p_e.dtype) \
                * jnp.asarray(noise_scale, m_p_e.dtype)
        z_p = m_p_e + noise.astype(m_p_e.dtype) * jnp.exp(logs_p_e)
        z = self.flow.apply(p["flow"], z_p, y_mask, g=g, reverse=True)
        if dec_q8 is not None:
            o = self.dec.apply(dec_q8, z * y_mask, g=g, x_mask=y_mask, q8=True)
        else:
            o = self.dec.apply(p["dec"], z * y_mask, g=g, x_mask=y_mask)
        return o, attn, y_mask, (z, z_p, m_p_e, logs_p_e)

    def infer_p1(self, p, x, emo, sid, x_mask=None):
        """Phase 1 of two-phase serving (models.py:558-566): encode text +
        predict durations. Host computes the alignment; phase 2 decodes."""
        if x_mask is not None:
            x_mask = x_mask.astype(x.dtype)
        g = self.emb_g.apply(p["emb_g"], sid)
        x_h, m_p, logs_p = self.enc_p.apply(p["enc_p"], x, x_mask, emo=emo, g=g)
        s_p = jnp.exp(logs_p)
        logw = self.dp.apply(p["dp"], x_h, x_mask, g=g)
        return m_p, s_p, logw, g

    def stream_decode(self, p, z, g=None, chunk_frames: int = 128,
                      halo: int = 24, decode_fn=None):
        """Chunked streaming HiFi-GAN decode (north-star config 5): the latent
        is decoded in overlapping windows with a receptive-field halo and only
        each window's interior is kept, so the concatenation is bit-identical
        to a full decode while bounding per-call memory/latency. The halo must
        cover the decoder's input-frame receptive radius (~15 frames for the
        base config's kernels; default 24 is conservative).

        z: (B, T, C_inter). Returns (B, T * prod(upsample_rates), 1).
        """
        up = 1
        for r in self.upsample_rates:
            up *= r
        T = z.shape[1]
        decode = decode_fn or (lambda zc: self.dec.apply(p["dec"], zc, g=g))
        outs = []
        for s in range(0, T, chunk_frames):
            lo = max(0, s - halo)
            hi = min(T, s + chunk_frames + halo)
            seg = decode(z[:, lo:hi])
            keep = min(chunk_frames, T - s)
            outs.append(seg[:, (s - lo) * up:(s - lo + keep) * up])
        return jnp.concatenate(outs, axis=1)

    def infer_p2(self, p, attn, m_p, s_p, g, noise, y_mask=None, dec_q8=None,
                 packed=True):
        """Phase 2 (models.py:568-575): expand prior along attn, flow-reverse,
        decode. noise: (B, T_y, C) pre-scaled noise. dec_q8: optional int8
        decoder params from quantize_decoder() — the opt-in quantized serving
        mode (flow stays in the float path). packed=False forces the dense
        (unpacked) decoder graph — used by the FLOP cross-check tests."""
        attn = attn.astype(m_p.dtype)
        noise = noise.astype(m_p.dtype)
        if y_mask is not None:
            y_mask = y_mask.astype(m_p.dtype)
        m_p_e = jnp.einsum("byx,bxc->byc", attn, m_p)
        s_p_e = jnp.einsum("byx,bxc->byc", attn, s_p)
        z_p = m_p_e + noise * s_p_e
        z = self.flow.apply(p["flow"], z_p, y_mask, g=g, reverse=True)
        if dec_q8 is not None:
            return self.dec.apply(dec_q8, _mask(z, y_mask), g=g, x_mask=y_mask, q8=True)
        return self.dec.apply(p["dec"], _mask(z, y_mask), g=g, x_mask=y_mask,
                              packed=packed)

    def quantize_decoder(self, p, z_cal, g_cal, y_mask=None):
        """Calibrate + quantize the HiFi-GAN decoder to int8 (nn.quant) on
        representative latents z_cal (B, T, inter) and speaker vectors g_cal.
        Returns dec_q8 for infer_p2(..., dec_q8=...)."""
        # jit both passes: eager execution would dispatch hundreds of tiny ops
        scales = jax.jit(lambda pd, z, g: self.dec.calibrate(pd, z, g=g, x_mask=y_mask))(
            p["dec"], z_cal, g_cal)
        return jax.jit(lambda pd, s: self.dec.quantize(pd, s))(p["dec"], scales)
