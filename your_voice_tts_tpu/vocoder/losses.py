"""Vocoder losses (reference vocoder/layers/losses.py): multi-resolution STFT
loss, LSGAN adversarial losses, feature matching."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import dsp
from ..ops.filters import hann_window

# (n_fft, hop, win) triples — the reference's multi-res STFT settings
DEFAULT_RESOLUTIONS = ((1024, 120, 600), (2048, 240, 1200), (512, 50, 240))


def _stft_mag(y: jnp.ndarray, n_fft: int, hop: int, win: int) -> jnp.ndarray:
    w = jnp.asarray(hann_window(win, n_fft), dtype=y.dtype)
    mag = jax.vmap(lambda s: dsp.stft_magnitude(
        s, jnp.int32(s.shape[-1]), n_fft, hop, w))(y)
    return jnp.maximum(mag, 1e-7)


def stft_loss(y_hat: jnp.ndarray, y: jnp.ndarray, n_fft: int, hop: int,
              win: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(spectral convergence, log-magnitude L1) at one resolution."""
    m_hat = _stft_mag(y_hat, n_fft, hop, win)
    m = _stft_mag(y, n_fft, hop, win)
    sc = jnp.linalg.norm(m - m_hat) / jnp.maximum(jnp.linalg.norm(m), 1e-7)
    mag = jnp.mean(jnp.abs(jnp.log(m) - jnp.log(m_hat)))
    return sc, mag


def multi_scale_stft_loss(y_hat: jnp.ndarray, y: jnp.ndarray,
                          resolutions=DEFAULT_RESOLUTIONS) -> jnp.ndarray:
    total = 0.0
    for n_fft, hop, win in resolutions:
        sc, mag = stft_loss(y_hat, y, n_fft, hop, win)
        total = total + sc + mag
    return total / len(resolutions)


# --- LSGAN (the reference GAN trainer's default) -----------------------------

def gen_adv_loss(fake_scores: list) -> jnp.ndarray:
    """Generator wants D(fake) -> 1."""
    loss = 0.0
    for score in fake_scores:
        loss = loss + jnp.mean((score - 1.0) ** 2)
    return loss / len(fake_scores)


def disc_adv_loss(real_scores: list, fake_scores: list) -> jnp.ndarray:
    """Discriminator wants D(real) -> 1, D(fake) -> 0."""
    loss = 0.0
    for r, f in zip(real_scores, fake_scores):
        loss = loss + jnp.mean((r - 1.0) ** 2) + jnp.mean(f ** 2)
    return loss / len(real_scores)


def feature_match_loss(fake_feats: list, real_feats: list) -> jnp.ndarray:
    """L1 between D feature maps of fake and real (reference MelganFeatLoss)."""
    loss, n = 0.0, 0
    for ff, rf in zip(fake_feats, real_feats):
        for a, b in zip(ff, rf):
            loss = loss + jnp.mean(jnp.abs(a - jax.lax.stop_gradient(b)))
            n += 1
    return loss / max(n, 1)
