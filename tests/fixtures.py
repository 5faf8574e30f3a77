"""Synthetic audio/text fixtures (no LJSpeech or network in this environment;
SURVEY.md SS7 phase 1: "synthetic WAV fixtures — sine sweeps/noise")."""

from __future__ import annotations

import numpy as np


def sine_sweep(sr: int = 22050, dur: float = 1.5, f0: float = 80.0,
               f1: float = 7800.0, seed: int = 0) -> np.ndarray:
    """Exponential chirp with gentle fade; exercises the whole mel range."""
    t = np.arange(int(sr * dur)) / sr
    k = np.log(f1 / f0) / dur
    phase = 2 * np.pi * f0 * (np.exp(k * t) - 1) / k
    x = 0.5 * np.sin(phase)
    fade = np.minimum(1.0, np.minimum(t / 0.02, (dur - t) / 0.02))
    return (x * fade).astype(np.float32)


def speech_like(sr: int = 22050, dur: float = 1.2, f0: float = 140.0,
                seed: int = 1) -> np.ndarray:
    """Harmonic stack with moving formant-ish envelope + noise floor;
    statistically closer to speech than a pure tone."""
    rng = np.random.default_rng(seed)
    t = np.arange(int(sr * dur)) / sr
    vibrato = f0 * (1.0 + 0.02 * np.sin(2 * np.pi * 4.0 * t))
    phase = 2 * np.pi * np.cumsum(vibrato) / sr
    x = np.zeros_like(t)
    for h in range(1, 12):
        amp = 1.0 / h * (0.6 + 0.4 * np.sin(2 * np.pi * (0.7 + 0.13 * h) * t + h))
        x += amp * np.sin(h * phase)
    x += 0.01 * rng.standard_normal(len(t))
    # amplitude envelope with syllable-ish gaps
    env = 0.5 * (1 + np.sin(2 * np.pi * 2.5 * t - np.pi / 2))
    x *= 0.25 * (0.15 + env)
    return x.astype(np.float32)


def silence_padded(x: np.ndarray, sr: int = 22050, lead: float = 0.3,
                   tail: float = 0.4) -> np.ndarray:
    return np.concatenate([
        np.zeros(int(sr * lead), dtype=np.float32),
        x,
        np.zeros(int(sr * tail), dtype=np.float32),
    ])


def white_noise(sr: int = 22050, dur: float = 0.8, seed: int = 2) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return (0.3 * rng.standard_normal(int(sr * dur))).astype(np.float32)
