"""GAN / feature / KL / STFT losses.

Capability parity with the reference losses.py (feature_loss:7-15,
discriminator_loss:18-31, generator_loss:34-43, kl_loss:46-61) and
stft_loss.py (STFTLoss:15-44, MultiResolutionSTFTLoss:47-95). All computed in
float32 regardless of activation dtype, mirroring the reference's
`.float()` casts inside autocast.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp

from vits_tpu.ops.stft import stft


def feature_loss(fmap_r, fmap_g):
    """L1 feature matching over all discriminator fmaps, ×2 (losses.py:7-15)."""
    loss = 0.0
    for dr, dg in zip(fmap_r, fmap_g):
        for rl, gl in zip(dr, dg):
            rl = jax.lax.stop_gradient(rl.astype(jnp.float32))
            loss = loss + jnp.mean(jnp.abs(rl - gl.astype(jnp.float32)))
    return loss * 2.0


def discriminator_loss(disc_real_outputs, disc_generated_outputs):
    """LSGAN D loss (losses.py:18-31). Returns (loss, r_losses, g_losses)."""
    loss = 0.0
    r_losses, g_losses = [], []
    for dr, dg in zip(disc_real_outputs, disc_generated_outputs):
        dr = dr.astype(jnp.float32)
        dg = dg.astype(jnp.float32)
        r_loss = jnp.mean(jnp.square(1.0 - dr))
        g_loss = jnp.mean(jnp.square(dg))
        loss = loss + r_loss + g_loss
        r_losses.append(r_loss)
        g_losses.append(g_loss)
    return loss, r_losses, g_losses


def generator_loss(disc_outputs):
    """LSGAN G loss (losses.py:34-43). Returns (loss, per-disc losses)."""
    loss = 0.0
    gen_losses = []
    for dg in disc_outputs:
        l = jnp.mean(jnp.square(1.0 - dg.astype(jnp.float32)))
        gen_losses.append(l)
        loss = loss + l
    return loss, gen_losses


def kl_loss(z_p, logs_q, m_p, logs_p, z_mask):
    """Masked Gaussian KL (losses.py:46-61). All (B, T, C); z_mask (B, T, 1)."""
    z_p = z_p.astype(jnp.float32)
    logs_q = logs_q.astype(jnp.float32)
    m_p = m_p.astype(jnp.float32)
    logs_p = logs_p.astype(jnp.float32)
    z_mask = z_mask.astype(jnp.float32)
    kl = logs_p - logs_q - 0.5
    kl = kl + 0.5 * jnp.square(z_p - m_p) * jnp.exp(-2.0 * logs_p)
    return jnp.sum(kl * z_mask) / jnp.sum(z_mask)


# ---------------------------------------------------------------------------
# multi-resolution STFT loss (train_stft path)
# ---------------------------------------------------------------------------

def stft_magnitude(x, fft_size, hop_size, win_size):
    """|STFT| with center=True padding and the 1e-7 floor of
    stft_loss.STFTLoss.spec2mag (stft_loss.py:22-23). x: (B, T) -> (B, T', F)."""
    re, im = stft(x, fft_size, hop_size, win_size, center=True)
    return jnp.sqrt(re * re + im * im + 1e-7)


def stft_losses_from_mags(x_mag, y_mag):
    """Spectral-convergence + log-magnitude L1 from precomputed magnitudes
    (stft_loss.py:40-42). x_mag = groundtruth, y_mag = predicted."""
    sc = jnp.linalg.norm(y_mag - x_mag) / jnp.linalg.norm(y_mag)
    mag = jnp.mean(jnp.abs(jnp.log(x_mag) - jnp.log(y_mag)))
    return sc, mag


def stft_loss_single(x, y, fft_size, hop_size, win_size):
    """Spectral-convergence + log-magnitude L1 (stft_loss.py:25-44).
    Returns (sc, mag, x_mag, y_mag)."""
    x_mag = stft_magnitude(x, fft_size, hop_size, win_size)
    y_mag = stft_magnitude(y, fft_size, hop_size, win_size)
    sc, mag = stft_losses_from_mags(x_mag, y_mag)
    return sc, mag, x_mag, y_mag


DEFAULT_RESOLUTIONS = ((128, 32, 128), (256, 64, 256), (512, 128, 512),
                       (1024, 256, 1024), (2048, 512, 2048))


def multi_resolution_stft_losses(xs_mag, ys_mag):
    """Resolution-averaged sc/mag losses from precomputed magnitude lists —
    lets the train step compute the 5-resolution STFT ONCE and share it with
    the MSTFT discriminator, exactly as train_stft.py:195-199 shares
    (y_mag, y_hat_mag) across the loss, D step, and G step."""
    sc_loss, mag_loss = 0.0, 0.0
    for x_mag, y_mag in zip(xs_mag, ys_mag):
        sc, mag = stft_losses_from_mags(x_mag, y_mag)
        sc_loss = sc_loss + sc
        mag_loss = mag_loss + mag
    n = float(len(xs_mag))
    return sc_loss / n, mag_loss / n


def multi_resolution_stft_loss(x, y, resolutions=DEFAULT_RESOLUTIONS):
    """5-resolution STFT loss (stft_loss.py:47-95). Returns
    (sc_loss, mag_loss, xs_mag, ys_mag)."""
    xs_mag = [stft_magnitude(x, *res) for res in resolutions]
    ys_mag = [stft_magnitude(y, *res) for res in resolutions]
    sc_loss, mag_loss = multi_resolution_stft_losses(xs_mag, ys_mag)
    return sc_loss, mag_loss, xs_mag, ys_mag
