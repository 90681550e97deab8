"""STFT / mel DSP on TPU.

Numerics contract follows the reference (mel_processing.py:58-119,
modules.py:378-401): hann (periodic) window, win_length zero-padded centered to
n_fft, `center=False` spectrograms pre-padded reflect by (n_fft - hop)/2,
magnitude = sqrt(re^2 + im^2 + 1e-6), mel = slaney-normalized librosa basis,
log-clamp(1e-5) compression.

TPU-first implementation: framing + windowing + DFT are folded into ONE strided
`lax.conv_general_dilated` whose kernel is the windowed real-DFT basis — a
single MXU matmul per hop instead of gather + FFT. For n_fft <= 4096 this is
faster than XLA's FFT path on TPU and fuses with surrounding elementwise ops.
An `rfft`-based path is kept for cross-checking.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def hann_window(win_length: int) -> np.ndarray:
    """Periodic Hann, matches torch.hann_window(win_length)."""
    n = np.arange(win_length, dtype=np.float64)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)).astype(np.float32)


@functools.lru_cache(maxsize=32)
def _dft_kernel(n_fft: int, win_length: int) -> np.ndarray:
    """Windowed real-DFT conv kernel, shape (n_fft, 1, 2*(n_fft//2+1)).

    Output channels = [real bins..., imag bins...] with the torch.stft sign
    convention: X[k] = sum_n w[n] x[n] e^{-2 pi i k n / N}.
    The (possibly shorter) window is zero-padded centered to n_fft, exactly as
    torch.stft does when win_length < n_fft.
    """
    window = np.zeros(n_fft, dtype=np.float64)
    lpad = (n_fft - win_length) // 2
    window[lpad:lpad + win_length] = hann_window(win_length).astype(np.float64)
    n = np.arange(n_fft, dtype=np.float64)
    k = np.arange(n_fft // 2 + 1, dtype=np.float64)
    ang = 2.0 * np.pi * np.outer(n, k) / n_fft  # (n_fft, F)
    basis = np.concatenate([np.cos(ang), -np.sin(ang)], axis=1)  # (n_fft, 2F)
    kern = (window[:, None] * basis).astype(np.float32)
    return kern[:, None, :]  # (K=n_fft, I=1, O=2F)


def _dft_kernel_traced(n_fft: int, win_length: int):
    """In-trace construction of the windowed real-DFT conv kernel.

    Emits a handful of iota/trig HLO ops instead of a multi-megabyte f32
    constant: at base config the stft-variant train step embeds the 2048-point
    basis (16.8 MB) several times, which bloated the lowered HLO text to
    ~190 MB and made the remote-compile relay unusable (>25 min). With the
    traced kernel the compiler sees ~10 ops per resolution and folds them
    itself.

    Accuracy: the phase n·k is reduced mod n_fft in int32 BEFORE the float
    multiply (n·k reaches ~2M, far past f32's exact-integer range), so
    cos/sin see exact angles in [0, 2π); max abs error vs the f64 host
    kernel is ~1e-6.
    """
    F = n_fft // 2 + 1
    n = jnp.arange(n_fft, dtype=jnp.int32)
    k = jnp.arange(F, dtype=jnp.int32)
    nk = (n[:, None] * k[None, :]) % n_fft
    ang = nk.astype(jnp.float32) * np.float32(2.0 * np.pi / n_fft)
    basis = jnp.concatenate([jnp.cos(ang), -jnp.sin(ang)], axis=1)  # (n_fft, 2F)
    i = jnp.arange(win_length, dtype=jnp.float32)
    hann = 0.5 - 0.5 * jnp.cos(i * np.float32(2.0 * np.pi / win_length))
    lpad = (n_fft - win_length) // 2
    window = jnp.zeros((n_fft,), jnp.float32).at[lpad:lpad + win_length].set(hann)
    return (window[:, None] * basis)[:, None, :]  # (K=n_fft, I=1, O=2F)


def frame_count(length: int, n_fft: int, hop: int, center: bool) -> int:
    if center:
        return length // hop + 1
    return (length - n_fft) // hop + 1


def _overlap_add(frames, hop: int, total_len: int):
    """(B, T', n_fft) frames → (B, total_len) by hop-strided shifted adds
    (no scatter; same construction as istft's OLA)."""
    B, Tp, n_fft = frames.shape
    m = -(-n_fft // hop)
    frames = jnp.pad(frames, ((0, 0), (0, 0), (0, m * hop - n_fft)))
    chunks = frames.reshape(B, Tp, m, hop)
    y = jnp.zeros((B, Tp + m - 1, hop), frames.dtype)
    for j in range(m):
        y = y.at[:, j:j + Tp].add(chunks[:, :, j])
    y = y.reshape(B, (Tp + m - 1) * hop)
    ola_len = (Tp - 1) * hop + n_fft
    y = y[:, :ola_len]
    if total_len > ola_len:
        y = jnp.pad(y, ((0, 0), (0, total_len - ola_len)))
    return y[:, :total_len]


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def _stft_conv(x, n_fft: int, hop: int, win_length: int):
    """VALID strided windowed-DFT conv: (B, T) → (B, T', 2F).

    custom_vjp: XLA's autodiff input-grad of this conv is a transposed conv
    with an n_fft-tap kernel at lhs_dilation=hop, which it executes orders of
    magnitude off the FLOP floor (measured ~46 ms for the 5-resolution loss
    stack at the stft-trainer shapes — scripts/probe_stft_terms.py). The
    hand-written backward is one (B, T', 2F) @ (2F, n_fft) matmul + a
    hop-strided overlap-add — sub-ms at the same shapes.
    """
    kern = _dft_kernel_traced(n_fft, win_length) if isinstance(
        x, jax.core.Tracer) else jnp.asarray(_dft_kernel(n_fft, win_length))
    return lax.conv_general_dilated(
        x[:, :, None], kern, (hop,), "VALID",
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.float32)


def _stft_conv_fwd(x, n_fft, hop, win_length):
    # residual: frame origin length + a 0-length dtype witness (numpy dtypes
    # are not valid jax residuals)
    return _stft_conv(x, n_fft, hop, win_length), \
        (x.shape[1], jnp.zeros((0,), x.dtype))


def _stft_conv_bwd(n_fft, hop, win_length, res, dy):
    # y[b,t,o] = sum_k x[b, t*hop + k] kern[k,o]  =>
    # dx = overlap-add_hop(dy @ kern^T); dx must match the primal dtype
    T, dtype_witness = res
    x_dtype = dtype_witness.dtype
    kern2 = _dft_kernel_traced(n_fft, win_length)[:, 0, :]  # (n_fft, 2F)
    d_frames = jnp.matmul(dy.astype(jnp.float32), kern2.T,
                          preferred_element_type=jnp.float32)
    return (_overlap_add(d_frames, hop, T).astype(x_dtype),)


_stft_conv.defvjp(_stft_conv_fwd, _stft_conv_bwd)


def stft(x, n_fft: int, hop_length: int, win_length: Optional[int] = None,
         center: bool = True, method: str = "matmul"):
    """Short-time Fourier transform.

    x: (B, T) float. Returns (re, im) each (B, n_frames, F=n_fft//2+1).
    center=True reflect-pads n_fft//2 both sides (torch.stft default used by
    the STFT-loss path, modules.py:386-392). Note the frame axis is TIME-major
    (B, T', F) in this framework; transpose for torch (B, F, T') parity.
    """
    if win_length is None:
        win_length = n_fft
    if center:
        x = jnp.pad(x, ((0, 0), (n_fft // 2, n_fft // 2)), mode="reflect")
    F = n_fft // 2 + 1
    if method == "matmul":
        # one strided windowed-DFT conv; custom_vjp replaces XLA's
        # pathological transposed-conv input-grad with matmul + overlap-add
        y = _stft_conv(x, n_fft, hop_length, win_length)  # (B, T', 2F)
        return y[..., :F], y[..., F:]
    # fft reference path
    nf = frame_count(x.shape[1], n_fft, hop_length, center=False)
    idx = np.arange(nf)[:, None] * hop_length + np.arange(n_fft)[None, :]
    frames = x[:, idx]  # (B, T', n_fft)
    window = np.zeros(n_fft, dtype=np.float32)
    lpad = (n_fft - win_length) // 2
    window[lpad:lpad + win_length] = hann_window(win_length)
    spec = jnp.fft.rfft(frames * window, axis=-1)
    return jnp.real(spec), jnp.imag(spec)


@functools.lru_cache(maxsize=32)
def _idft_kernel(n_fft: int, win_length: int) -> np.ndarray:
    """Windowed inverse real-DFT matrix, shape (2F, n_fft): frames =
    [re, im] @ kernel reconstructs w[n]·x[n] per frame (torch.istft applies
    the synthesis window after the iFFT)."""
    window = np.zeros(n_fft, dtype=np.float64)
    lpad = (n_fft - win_length) // 2
    window[lpad:lpad + win_length] = hann_window(win_length).astype(np.float64)
    F = n_fft // 2 + 1
    n = np.arange(n_fft, dtype=np.float64)
    k = np.arange(F, dtype=np.float64)
    ang = 2.0 * np.pi * np.outer(k, n) / n_fft  # (F, n_fft)
    # irfft: x[n] = (1/N) Σ_k c_k (re_k cos - im_k sin), c_k = 2 except DC/Nyquist
    c = np.full(F, 2.0)
    c[0] = 1.0
    if n_fft % 2 == 0:
        c[-1] = 1.0
    basis = np.concatenate([c[:, None] * np.cos(ang), -c[:, None] * np.sin(ang)], axis=0) / n_fft
    return (basis * window[None, :]).astype(np.float32)  # (2F, n_fft)


@functools.lru_cache(maxsize=32)
def _ola_window_envelope(n_fft: int, hop: int, win_length: int, n_frames: int) -> np.ndarray:
    """Σ_t w²[n - t·hop]: the overlap-add normalization torch.istft divides by."""
    window = np.zeros(n_fft, dtype=np.float64)
    lpad = (n_fft - win_length) // 2
    window[lpad:lpad + win_length] = hann_window(win_length).astype(np.float64)
    env = np.zeros((n_frames - 1) * hop + n_fft, dtype=np.float64)
    for t in range(n_frames):
        env[t * hop:t * hop + n_fft] += window ** 2
    return env.astype(np.float32)


def istft(re, im, n_fft: int, hop_length: int, win_length: Optional[int] = None,
          center: bool = True):
    """Inverse STFT (TorchSTFT.istft parity, modules.py:394-400).

    re/im: (B, T', F) time-major (transpose of torch's (B, F, T')). Returns
    (B, t) with t = (T'-1)·hop for center=True. TPU-first: iDFT is one matmul
    on the MXU; overlap-add is Σ of hop-strided reshapes (no scatter).
    """
    if win_length is None:
        win_length = n_fft
    B, Tp, F = re.shape
    kern = jnp.asarray(_idft_kernel(n_fft, win_length))
    # HIGHEST: keep fp32 mantissa through the MXU (istft is a parity surface,
    # not a hot path; default TPU matmul precision truncates inputs to bf16).
    frames = jnp.dot(jnp.concatenate([re, im], axis=-1), kern.astype(re.dtype),
                     precision=lax.Precision.HIGHEST)  # (B, T', n_fft)
    # overlap-add: pad frame length to a multiple of hop, then each frame is
    # m hop-chunks added at successive frame offsets — m shifted adds, no scatter.
    m = -(-n_fft // hop_length)
    frames = jnp.pad(frames, ((0, 0), (0, 0), (0, m * hop_length - n_fft)))
    chunks = frames.reshape(B, Tp, m, hop_length)
    total = Tp + m - 1
    y = jnp.zeros((B, total, hop_length), frames.dtype)
    for j in range(m):
        y = y.at[:, j:j + Tp].add(chunks[:, :, j])
    y = y.reshape(B, total * hop_length)[:, :(Tp - 1) * hop_length + n_fft]
    env = jnp.asarray(_ola_window_envelope(n_fft, hop_length, win_length, Tp))
    y = y / jnp.maximum(env, 1e-11).astype(y.dtype)
    if center:
        y = y[:, n_fft // 2:n_fft // 2 + (Tp - 1) * hop_length]
    return y


def spectrogram(y, n_fft: int, hop_length: int, win_length: int,
                method: str = "matmul"):
    """Linear magnitude spectrogram, reference mel_processing.spectrogram_torch
    (mel_processing.py:58-77): center=False with explicit reflect pre-pad of
    (n_fft - hop)/2 on both sides; magnitude floor 1e-6 under the sqrt.

    y: (B, T) waveform in [-1, 1]. Returns (B, T', F) with T' = T//hop for
    T a multiple of hop (general: (T + 2*pad - n_fft)//hop + 1).
    """
    pad = (n_fft - hop_length) // 2
    y = jnp.pad(y, ((0, 0), (pad, pad)), mode="reflect")
    re, im = stft(y, n_fft, hop_length, win_length, center=False, method=method)
    return jnp.sqrt(re * re + im * im + 1e-6)


# ---------------------------------------------------------------------------
# mel
# ---------------------------------------------------------------------------

def _hz_to_mel_slaney(f):
    f = np.asarray(f, dtype=np.float64)
    f_sp = 200.0 / 3
    mels = f / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(f >= min_log_hz, min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep, mels)


def _mel_to_hz_slaney(m):
    m = np.asarray(m, dtype=np.float64)
    f_sp = 200.0 / 3
    freqs = m * f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(m >= min_log_mel, min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs)


@functools.lru_cache(maxsize=32)
def mel_filterbank(sampling_rate: int, n_fft: int, n_mels: int,
                   fmin: float = 0.0, fmax: Optional[float] = None) -> np.ndarray:
    """Slaney-scale, slaney-normalized triangular mel filterbank, (F, n_mels).

    Matches librosa.filters.mel(htk=False, norm='slaney') as consumed by the
    reference (mel_processing.py:85), transposed to (F, M) for channel-last
    matmul. Implemented from the Slaney Auditory-Toolbox formulas.
    """
    if fmax is None:
        fmax = sampling_rate / 2.0
    F = n_fft // 2 + 1
    fftfreqs = np.linspace(0.0, sampling_rate / 2.0, F)
    mel_pts = _mel_to_hz_slaney(np.linspace(_hz_to_mel_slaney(fmin), _hz_to_mel_slaney(fmax), n_mels + 2))
    fdiff = np.diff(mel_pts)
    ramps = mel_pts[:, None] - fftfreqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    enorm = 2.0 / (mel_pts[2:n_mels + 2] - mel_pts[:n_mels])
    weights = weights * enorm[:, None]
    return weights.T.astype(np.float32)  # (F, M)


def dynamic_range_compression(x, clip_val=1e-5):
    """log-clamp compression (mel_processing.py:26-32)."""
    return jnp.log(jnp.clip(x, min=clip_val))


def spec_to_mel(spec, n_fft, n_mels, sampling_rate, fmin=0.0, fmax=None):
    """spec: (B, T, F) linear magnitudes -> (B, T, M) log-mel.
    Reference: spec_to_mel_torch (mel_processing.py:80-89)."""
    fb = jnp.asarray(mel_filterbank(sampling_rate, n_fft, n_mels, fmin, fmax))
    mel = jnp.matmul(spec, fb, preferred_element_type=jnp.float32)
    return dynamic_range_compression(mel)


def mel_spectrogram(y, n_fft, n_mels, sampling_rate, hop_length, win_length,
                    fmin=0.0, fmax=None, method: str = "matmul"):
    """Waveform -> (B, T, M) log-mel (mel_spectrogram_torch,
    mel_processing.py:92-119)."""
    spec = spectrogram(y, n_fft, hop_length, win_length, method=method)
    return spec_to_mel(spec, n_fft, n_mels, sampling_rate, fmin, fmax)
