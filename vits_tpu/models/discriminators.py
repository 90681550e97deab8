"""Multi-period waveform discriminators (MPD).

Capability parity with the reference models.py: DiscriminatorP (321-355,
period-reshaped 2-D convs), DiscriminatorS (358-383, grouped 1-D convs),
MultiPeriodDiscriminator (386-408, S + periods [2,3,5,7,11]).

TPU layouts: waveforms are (B, T, 1); DiscriminatorP reshapes to
(B, T//p, p, 1) NHWC. Feature maps are returned for the feature-matching loss.
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import jax
import jax.numpy as jnp

from vits_tpu.nn.core import Conv1d, Conv2d, leaky_relu

LRELU_SLOPE = 0.1


def _pad(k, d=1):
    return (k * d - d) // 2


@dataclasses.dataclass(frozen=True)
class DiscriminatorP:
    period: int
    kernel_size: int = 5
    stride: int = 3
    use_spectral_norm: bool = False

    def _convs(self):
        k, s = self.kernel_size, self.stride
        wn = not self.use_spectral_norm
        sn = self.use_spectral_norm
        chans = [(1, 32), (32, 128), (128, 512), (512, 1024)]
        convs = [Conv2d(ci, co, (k, 1), (s, 1), (_pad(k), 0),
                        weight_norm=wn, spectral_norm=sn) for ci, co in chans]
        convs.append(Conv2d(1024, 1024, (k, 1), (1, 1), (_pad(k), 0),
                            weight_norm=wn, spectral_norm=sn))
        return convs

    def _post(self):
        return Conv2d(1024, 1, (3, 1), (1, 1), (1, 0),
                      weight_norm=not self.use_spectral_norm,
                      spectral_norm=self.use_spectral_norm)

    def init_params(self, key):
        convs = self._convs()
        ks = jax.random.split(key, len(convs) + 1)
        return {"convs": {str(i): c.init_params(ks[i]) for i, c in enumerate(convs)},
                "conv_post": self._post().init_params(ks[-1])}

    def apply(self, p, x):
        """x: (B, T, 1) -> (score (B, n), fmaps)."""
        B, T, C = x.shape
        if T % self.period != 0:
            n_pad = self.period - (T % self.period)
            x = jnp.pad(x, ((0, 0), (0, n_pad), (0, 0)), mode="reflect")
            T = T + n_pad
        x = x.reshape(B, T // self.period, self.period, C)
        fmap = []
        for i, conv in enumerate(self._convs()):
            x = conv.apply(p["convs"][str(i)], x)
            x = leaky_relu(x, LRELU_SLOPE)
            fmap.append(x)
        x = self._post().apply(p["conv_post"], x)
        fmap.append(x)
        return x.reshape(B, -1), fmap

    __call__ = apply


@dataclasses.dataclass(frozen=True)
class DiscriminatorS:
    use_spectral_norm: bool = False

    def _convs(self):
        wn = not self.use_spectral_norm
        sn = self.use_spectral_norm
        spec = [(1, 16, 15, 1, 1, 7), (16, 64, 41, 4, 4, 20), (64, 256, 41, 4, 16, 20),
                (256, 1024, 41, 4, 64, 20), (1024, 1024, 41, 4, 256, 20), (1024, 1024, 5, 1, 1, 2)]
        return [Conv1d(ci, co, k, stride=s, groups=g, padding=pd,
                       weight_norm=wn, spectral_norm=sn)
                for ci, co, k, s, g, pd in spec]

    def _post(self):
        return Conv1d(1024, 1, 3, padding=1,
                      weight_norm=not self.use_spectral_norm,
                      spectral_norm=self.use_spectral_norm)

    def init_params(self, key):
        convs = self._convs()
        ks = jax.random.split(key, len(convs) + 1)
        return {"convs": {str(i): c.init_params(ks[i]) for i, c in enumerate(convs)},
                "conv_post": self._post().init_params(ks[-1])}

    def apply(self, p, x):
        fmap = []
        for i, conv in enumerate(self._convs()):
            x = conv.apply(p["convs"][str(i)], x)
            x = leaky_relu(x, LRELU_SLOPE)
            fmap.append(x)
        x = self._post().apply(p["conv_post"], x)
        fmap.append(x)
        return x.reshape(x.shape[0], -1), fmap

    __call__ = apply


@dataclasses.dataclass(frozen=True)
class MultiPeriodDiscriminator:
    use_spectral_norm: bool = False
    periods: Tuple[int, ...] = (2, 3, 5, 7, 11)

    def _discs(self):
        return [DiscriminatorS(self.use_spectral_norm)] + \
               [DiscriminatorP(pp, use_spectral_norm=self.use_spectral_norm)
                for pp in self.periods]

    def init_params(self, key):
        discs = self._discs()
        ks = jax.random.split(key, len(discs))
        return {"discriminators": {str(i): d.init_params(ks[i])
                                   for i, d in enumerate(discs)}}

    def apply(self, p, y, y_hat):
        """y, y_hat: (B, T, 1). Returns (y_d_rs, y_d_gs, fmap_rs, fmap_gs).

        Real and fake run as ONE batched pass per sub-discriminator (convs
        are independent across batch, so values are identical) — halves the
        discriminator op count in the train-step HLO and feeds the MXU
        2B-sized convs instead of two B-sized ones."""
        B = y.shape[0]
        both = jnp.concatenate([y, y_hat], axis=0)
        y_d_rs, y_d_gs, fmap_rs, fmap_gs = [], [], [], []
        for i, d in enumerate(self._discs()):
            s, f = d.apply(p["discriminators"][str(i)], both)
            y_d_rs.append(s[:B])
            y_d_gs.append(s[B:])
            fmap_rs.append([fm[:B] for fm in f])
            fmap_gs.append([fm[B:] for fm in f])
        return y_d_rs, y_d_gs, fmap_rs, fmap_gs

    __call__ = apply
