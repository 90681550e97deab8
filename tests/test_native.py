"""Native C++ dataio vs the pure-Python implementations."""
import os
import subprocess

import numpy as np
import pytest

from vits_tpu import native
from vits_tpu.utils.audio import write_wav, read_wav, spectrogram_np, _hann


@pytest.fixture(scope="module", autouse=True)
def build_native():
    d = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "vits_tpu", "native")
    subprocess.run(["make", "-C", d], check=True, capture_output=True)
    assert native.available()


def test_read_bin(tmp_path):
    rng = np.random.RandomState(0)
    a = rng.randn(37, 16).astype(np.float32)
    p = str(tmp_path / "a.vec")
    a.tofile(p)
    got = native.read_bin(p, 16)
    np.testing.assert_array_equal(got, a)


@pytest.mark.parametrize("subtype", ["PCM_16", "FLOAT"])
def test_read_wav_matches_python(tmp_path, subtype):
    rng = np.random.RandomState(1)
    x = rng.uniform(-0.7, 0.7, 5000).astype(np.float32)
    p = str(tmp_path / "a.wav")
    write_wav(p, x, 16000, subtype=subtype)
    py, sr_py = read_wav(p)
    peak = np.abs(py).max()
    py_norm = py / peak if peak > 0 else py
    nat, sr_nat = native.read_wav_norm(p)
    assert sr_nat == sr_py == 16000
    np.testing.assert_allclose(nat, py_norm, atol=1e-6)


def test_wav_samples_metadata(tmp_path):
    x = np.zeros(1234, np.float32)
    p = str(tmp_path / "b.wav")
    write_wav(p, x, 8000)
    n, sr = native.wav_samples(p)
    assert (n, sr) == (1234, 8000)


def test_frame_signal_matches_numpy(tmp_path):
    rng = np.random.RandomState(2)
    y = rng.uniform(-0.9, 0.9, 192 * 25).astype(np.float32)
    n_fft, hop, win = 1024, 192, 768
    window = np.zeros(n_fft, dtype=np.float32)
    lpad = (n_fft - win) // 2
    window[lpad:lpad + win] = _hann(win)
    frames = native.frame_signal(y, window, n_fft, hop)
    pad = (n_fft - hop) // 2
    yp = np.pad(y, (pad, pad), mode="reflect")
    n_frames = (len(yp) - n_fft) // hop + 1
    idx = np.arange(n_frames)[:, None] * hop + np.arange(n_fft)[None, :]
    ref = yp[idx] * window
    np.testing.assert_allclose(frames, ref, atol=1e-7)
    # full spectrogram path (uses native framing under the hood)
    spec = spectrogram_np(y, n_fft, hop, win)
    assert spec.shape == (n_frames, n_fft // 2 + 1)
