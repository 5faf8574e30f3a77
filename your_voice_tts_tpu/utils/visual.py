"""Diagnostic plots (reference utils/visual.py): alignment heatmap +
spectrogram, logged to TensorBoard / saved during eval."""

from __future__ import annotations

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def plot_alignment(alignment: np.ndarray, title: str | None = None):
    """alignment: [T_dec, T_in]."""
    fig, ax = plt.subplots(figsize=(8, 6))
    im = ax.imshow(np.asarray(alignment).T, aspect="auto", origin="lower",
                   interpolation="none")
    fig.colorbar(im, ax=ax)
    ax.set_xlabel("Decoder timestep")
    ax.set_ylabel("Encoder timestep")
    if title:
        ax.set_title(title)
    fig.tight_layout()
    return fig


def plot_spectrogram(spectrogram: np.ndarray, title: str | None = None,
                     time_major: bool | None = None):
    """spectrogram: [T, F] or [F, T]; time is drawn on x.

    time_major: pass True ([T, F]) or False ([F, T]) when known — the
    shape heuristic used otherwise misorients clips with fewer frames than
    channels (e.g. sub-second utterances)."""
    s = np.asarray(spectrogram)
    transpose = (not time_major) if time_major is not None \
        else s.shape[0] < s.shape[1]
    if transpose:
        s = s.T
    fig, ax = plt.subplots(figsize=(10, 4))
    im = ax.imshow(s.T, aspect="auto", origin="lower", interpolation="none")
    fig.colorbar(im, ax=ax)
    ax.set_xlabel("Frames")
    ax.set_ylabel("Channels")
    if title:
        ax.set_title(title)
    fig.tight_layout()
    return fig
