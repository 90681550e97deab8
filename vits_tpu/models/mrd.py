"""Multi-resolution wave + STFT discriminators (MRD) for the train_stft path.

Capability parity with the reference mrd.py: WaveDiscriminator (15-55, dilated
1-D stack, spectral-norm default), MultiWaveDiscriminator (58-91, DWT-like ×2
reshape per level), STFTDiscriminator (94-156, 2-D convs collapsing the
frequency axis), MultiSTFTDiscriminator (159-188, 5 resolutions),
MultiWaveSTFTDiscriminator (200-237). The STFT branch consumes magnitudes that
are computed ONCE by the multi-resolution STFT loss and shared
(train_stft.py:195-199) — same contract here.

Layouts: waves (B, T, C); magnitudes (B, T', F) channel-last, i.e. the
reference's (B, F, T) transposed. STFTDiscriminator therefore convolves NHWC
input (B, 1→cc, F, T') built by transposing its (B, T', F) input.
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from vits_tpu.nn.core import Conv1d, Conv2d, leaky_relu

_DN1 = ("NWC", "WIO", "NWC")

LRELU_SLOPE = 0.2


@dataclasses.dataclass(frozen=True)
class WaveDiscriminator:
    in_channels: int
    kernel_size: int = 5
    layers: int = 10
    conv_channels: int = 64
    use_weight_norm: bool = False

    def _convs(self):
        wn = self.use_weight_norm
        sn = not wn
        cc = self.conv_channels
        gain = 1.0  # xavier with leaky-relu gain applied via init_gain
        convs = [Conv1d(self.in_channels, cc, 1, weight_norm=wn, spectral_norm=sn,
                        init="xavier", init_gain=_lrelu_gain())]
        for i in range(self.layers - 2):
            convs.append(Conv1d(cc, cc, self.kernel_size, dilation=i + 2,
                                weight_norm=wn, spectral_norm=sn,
                                init="xavier", init_gain=_lrelu_gain()))
        convs.append(Conv1d(cc, 1, 1, weight_norm=wn, spectral_norm=sn,
                            init="xavier", init_gain=_lrelu_gain()))
        return convs

    def init_params(self, key):
        convs = self._convs()
        ks = jax.random.split(key, len(convs))
        return {"convs": {str(i): c.init_params(ks[i]) for i, c in enumerate(convs)}}

    def apply(self, p, x):
        """x: (B, T, in_channels) -> (B, T') score (no padding: VALID convs).
        Dilated middle layers run phase-decomposed (see
        dilated_valid_conv_phased) — same values, dense convs on the MXU."""
        convs = self._convs()
        for i, conv in enumerate(convs):
            pc = p["convs"][str(i)]
            if conv.dilation > 1:
                x = dilated_valid_conv_phased(conv, pc, x)
            else:
                x = conv.apply(pc, x)
            if i < len(convs) - 1:
                x = leaky_relu(x, LRELU_SLOPE)
        return x[..., 0]

    __call__ = apply


def _lrelu_gain(slope=LRELU_SLOPE):
    import math
    return math.sqrt(2.0 / (1.0 + slope ** 2))


def dilated_valid_conv_phased(conv, p, x):
    """VALID conv with rhs dilation d, computed as d dense (dilation-1) convs
    over the d phase streams folded into the batch dim.

    y[t] = Σ_j x[t + j*d] w[j]; writing t = m*d + r, each output phase r is a
    dense VALID conv over stream x[r::d] — identical numerics, but the TPU
    executes standard convs instead of a dilated form it handles degenerately
    (measured ~0.05% MFU for the MRD WaveDiscriminator stack's d=2..9 convs).
    """
    from vits_tpu.nn.core import wn_kernel
    d, k = conv.dilation, conv.kernel_size
    B, T, C = x.shape
    T_out = T - (k - 1) * d
    M = -(-T // d)  # phase-stream length (zero-pad tail; padded outputs are
    x = jnp.pad(x, ((0, 0), (0, M * d - T), (0, 0)))     # sliced off below)
    xp = x.reshape(B, M, d, C).transpose(0, 2, 1, 3).reshape(B * d, M, C)
    w = wn_kernel(p)
    y = lax.conv_general_dilated(xp, w, (1,), "VALID", dimension_numbers=_DN1)
    C_out = y.shape[-1]
    y = y.reshape(B, d, M - k + 1, C_out).transpose(0, 2, 1, 3)
    y = y.reshape(B, (M - k + 1) * d, C_out)[:, :T_out]
    if conv.bias:
        y = y + p["b"]
    return y


@dataclasses.dataclass(frozen=True)
class MultiWaveDiscriminator:
    """mrd.MultiWaveDiscriminator (mrd.py:58-91): level i sees the wave
    reshaped into 2^i channels (cheap DWT-ish decimation)."""
    num_dwt: int = 5
    kernel_size: int = 5
    layers: int = 10
    conv_channels: int = 64
    use_weight_norm: bool = False

    def _disc(self, i):
        return WaveDiscriminator(2 ** i, self.kernel_size, self.layers,
                                 self.conv_channels + i * 32,
                                 use_weight_norm=self.use_weight_norm)

    def init_params(self, key):
        ks = jax.random.split(key, self.num_dwt)
        return {"discriminators": {str(i): self._disc(i).init_params(ks[i])
                                   for i in range(self.num_dwt)}}

    def apply(self, p, x):
        """x: (B, T, 1) -> list of per-level scores."""
        outs = []
        for i in range(self.num_dwt):
            outs.append(self._disc(i).apply(p["discriminators"][str(i)], x))
            if i + 1 == self.num_dwt:
                break
            B, T, C = x.shape
            period = 2 ** (i + 1)
            if (T * C) % period != 0:
                n_pad = (period - (T * C) % period) // C
                x = jnp.pad(x, ((0, 0), (0, n_pad), (0, 0)), mode="reflect")
                T += n_pad
            # torch view(b, period, -1) on a contiguous (B, C, T) halves each
            # channel's sequence into two new channels (cn = 2*c + half).
            # Channel-last equivalent: split T, move the half-index into C.
            x = x.reshape(B, 2, T // 2, C).transpose(0, 2, 3, 1).reshape(B, T // 2, 2 * C)
        return outs

    __call__ = apply


@dataclasses.dataclass(frozen=True)
class STFTDiscriminator:
    """mrd.STFTDiscriminator (mrd.py:94-156): 2-D conv pyramid with
    frequency-collapsing strides, final (F_left, 1) conv -> (B, T')."""
    fft_size: int = 1024
    hop_size: int = 256
    win_size: int = 1024
    num_layers: int = 4
    kernel_size: int = 3
    stride: int = 1
    conv_channels: int = 256
    use_weight_norm: bool = False

    def _plan(self):
        F = self.fft_size // 2 + 1
        s0 = int(F ** (1.0 / float(self.num_layers)))
        k0 = s0 * 2 + 1
        k1 = self.kernel_size
        cc = self.conv_channels
        wn = self.use_weight_norm
        sn = not wn
        convs = [Conv2d(1, cc, (k0, k1), (s0, self.stride), (0, k1 // 2),
                        weight_norm=wn, spectral_norm=sn,
                        init="xavier", init_gain=_lrelu_gain())]
        F = int((F - k0) / s0 + 1)
        for _ in range(self.num_layers - 2):
            convs.append(Conv2d(cc, cc, (k0, k1), (s0, self.stride), (0, k1 // 2),
                                weight_norm=wn, spectral_norm=sn,
                                init="xavier", init_gain=_lrelu_gain()))
            F = int((F - k0) / s0 + 1)
        convs.append(Conv2d(cc, 1, (F, 1), (1, 1), (0, 0),
                            weight_norm=wn, spectral_norm=sn,
                            init="xavier", init_gain=_lrelu_gain()))
        return convs

    def init_params(self, key):
        convs = self._plan()
        ks = jax.random.split(key, len(convs))
        return {"convs": {str(i): c.init_params(ks[i]) for i, c in enumerate(convs)}}

    def apply(self, p, mag):
        """mag: (B, T', F) magnitude spectrogram -> (B, T'') score."""
        x = jnp.swapaxes(mag, 1, 2)[..., None]  # (B, F, T', 1) NHWC
        convs = self._plan()
        for i, conv in enumerate(convs):
            x = conv.apply(p["convs"][str(i)], x)
            if i < len(convs) - 1:
                x = leaky_relu(x, LRELU_SLOPE)
        return x[:, 0, :, 0]  # (B, T'')

    __call__ = apply


@dataclasses.dataclass(frozen=True)
class MultiSTFTDiscriminator:
    fft_sizes: Tuple[int, ...] = (128, 256, 512, 1024, 2048)
    hop_sizes: Tuple[int, ...] = (32, 64, 128, 256, 512)
    win_sizes: Tuple[int, ...] = (128, 256, 512, 1024, 2048)
    num_layers: Tuple[int, ...] = (5, 6, 7, 8, 9)
    kernel_sizes: Tuple[int, ...] = (5, 5, 5, 5, 5)
    conv_channels: Tuple[int, ...] = (64, 64, 64, 64, 64)
    use_weight_norm: bool = False

    def _disc(self, i):
        return STFTDiscriminator(self.fft_sizes[i], self.hop_sizes[i],
                                 self.win_sizes[i], self.num_layers[i],
                                 self.kernel_sizes[i],
                                 conv_channels=self.conv_channels[i],
                                 use_weight_norm=self.use_weight_norm)

    def init_params(self, key):
        n = len(self.fft_sizes)
        ks = jax.random.split(key, n)
        return {"discriminators": {str(i): self._disc(i).init_params(ks[i])
                                   for i in range(n)}}

    def apply(self, p, mags):
        """mags: list of (B, T', F_i) magnitudes (shared with the STFT loss)."""
        return [self._disc(i).apply(p["discriminators"][str(i)], m)
                for i, m in enumerate(mags)]

    __call__ = apply


@dataclasses.dataclass(frozen=True)
class MultiWaveSTFTDiscriminator:
    """mrd.MultiWaveSTFTDiscriminator (mrd.py:200-237): MWD + MSTFT."""
    num_dwt: int = 5
    wave_kernel_size: int = 5
    wave_layers: int = 10
    wave_conv_channels: int = 64
    fft_sizes: Tuple[int, ...] = (128, 256, 512, 1024, 2048)
    hop_sizes: Tuple[int, ...] = (32, 64, 128, 256, 512)
    win_sizes: Tuple[int, ...] = (128, 256, 512, 1024, 2048)
    stft_num_layers: Tuple[int, ...] = (5, 6, 7, 8, 9)
    stft_kernel_sizes: Tuple[int, ...] = (5, 5, 5, 5, 5)
    stft_conv_channels: Tuple[int, ...] = (64, 64, 64, 64, 64)
    use_weight_norm: bool = False

    @property
    def mwd(self):
        return MultiWaveDiscriminator(self.num_dwt, self.wave_kernel_size,
                                      self.wave_layers, self.wave_conv_channels,
                                      self.use_weight_norm)

    @property
    def mfd(self):
        return MultiSTFTDiscriminator(self.fft_sizes, self.hop_sizes,
                                      self.win_sizes, self.stft_num_layers,
                                      self.stft_kernel_sizes, self.stft_conv_channels,
                                      self.use_weight_norm)

    def init_params(self, key):
        k1, k2 = jax.random.split(key)
        return {"mwd": self.mwd.init_params(k1), "mfd": self.mfd.init_params(k2)}

    def apply(self, p, x, mags):
        """x: (B, T, 1) wave; mags: list of (B, T', F_i). Returns score list."""
        return self.mwd.apply(p["mwd"], x) + self.mfd.apply(p["mfd"], mags)

    __call__ = apply
