"""Golden tests: istft vs torch.istft (TorchSTFT parity, modules.py:394-400)
and the subpixel ConvTranspose1d fast path vs torch.nn.ConvTranspose1d."""

import dataclasses

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from vits_tpu.ops import stft as S
from vits_tpu.nn.core import ConvTranspose1d


@pytest.mark.parametrize("n_fft,hop,win,T", [
    (1024, 256, 1024, 4096),
    (128, 32, 128, 1000),
    (512, 128, 384, 3000),   # win < n_fft
    (600, 150, 600, 1537),   # non-power-of-two, T not multiple of hop
])
def test_istft_matches_torch(n_fft, hop, win, T):
    rng = np.random.RandomState(1)
    x = rng.randn(3, T).astype(np.float32)
    re, im = S.stft(jnp.asarray(x), n_fft, hop, win, center=True)
    y = np.asarray(S.istft(re, im, n_fft, hop, win, center=True))
    w = torch.hann_window(win)
    spec = torch.stft(torch.from_numpy(x), n_fft, hop, win, window=w,
                      center=True, pad_mode="reflect", return_complex=True)
    y_t = torch.istft(spec, n_fft, hop, win, window=w, center=True).numpy()
    assert y.shape == y_t.shape
    np.testing.assert_allclose(y, y_t, atol=2e-4)


def test_istft_roundtrip():
    rng = np.random.RandomState(2)
    x = rng.uniform(-0.9, 0.9, (2, 2048)).astype(np.float32)
    re, im = S.stft(jnp.asarray(x), 512, 128, center=True)
    y = np.asarray(S.istft(re, im, 512, 128, center=True))
    np.testing.assert_allclose(y, x[:, :y.shape[1]], atol=1e-4)


@pytest.mark.parametrize("cin,cout,k,u,pad,T", [
    (6, 4, 16, 8, 4, 11),   # base-config stage 0 shape family (k=2u)
    (5, 3, 12, 6, 3, 7),
    (4, 4, 4, 2, 1, 9),
    (3, 2, 7, 3, 2, 8),     # k not a multiple of u
    (3, 2, 9, 4, 0, 6),     # no padding, output longer than T*u
    (2, 3, 5, 5, 2, 4),     # k == u
])
def test_subpixel_conv_transpose_matches_torch(cin, cout, k, u, pad, T):
    layer = ConvTranspose1d(cin, cout, k, u, padding=pad)
    p = layer.init_params(jax.random.PRNGKey(1))
    rng = np.random.RandomState(0)
    x = rng.randn(2, T, cin).astype(np.float32)
    y_fast = np.asarray(layer.apply(p, jnp.asarray(x)))
    y_slow = np.asarray(dataclasses.replace(layer, subpixel=False).apply(p, jnp.asarray(x)))
    tl = torch.nn.ConvTranspose1d(cin, cout, k, u, padding=pad)
    tl.weight.data = torch.from_numpy(np.transpose(np.asarray(p["w"]), (1, 2, 0)).copy())
    tl.bias.data = torch.from_numpy(np.asarray(p["b"]).copy())
    y_t = tl(torch.from_numpy(np.transpose(x, (0, 2, 1)))).detach().numpy().transpose(0, 2, 1)
    assert y_fast.shape == y_t.shape
    np.testing.assert_allclose(y_fast, y_slow, atol=1e-5)
    np.testing.assert_allclose(y_fast, y_t, atol=1e-5)
