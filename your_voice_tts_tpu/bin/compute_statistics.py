"""Compute per-bin mean/std normalization statistics over a corpus
(reference bin/compute_statistics.py -> `scale_stats.npy`, consumed via
`audio.stats_path`; SURVEY.md §5 config `stats_path?`).

Stats are accumulated over the UN-normalized dB-minus-ref spectrograms (the
same values the scaler later transforms), one Welford-style sum/sumsq pass:

    python -m your_voice_tts_tpu.bin.compute_statistics \
        --config_path config.json --out_path scale_stats.npy
"""

from __future__ import annotations

import argparse
import dataclasses

import numpy as np


def compute_statistics(cfg, items, include_linear: bool = True) -> dict:
    """items: [(text, wav_path, speaker), ...] formatter rows. Returns the
    scale_stats dict (mel_mean/mel_std [n_mels], linear_mean/linear_std)."""
    from ..audio import AudioProcessor

    # accumulate on raw dB values: normalization (and any existing stats) off
    raw_audio = dataclasses.replace(cfg.audio, signal_norm=False,
                                    stats_path=None)
    ap = AudioProcessor(raw_audio)
    n = 0
    mel_sum = mel_sq = lin_sum = lin_sq = 0.0
    for item in items:
        wav = ap.load_wav(item[1])
        # accumulate in float64: millions of frames of ~1e3-magnitude
        # dB-squared values overflow float32's representable step and the
        # E[x^2]-E[x]^2 variance is cancellation-prone
        mel = np.asarray(ap.melspectrogram(wav), np.float64)  # [n_mels, T]
        mel_sum = mel_sum + mel.sum(axis=1)
        mel_sq = mel_sq + (mel ** 2).sum(axis=1)
        if include_linear:
            lin = np.asarray(ap.spectrogram(wav), np.float64)
            lin_sum = lin_sum + lin.sum(axis=1)
            lin_sq = lin_sq + (lin ** 2).sum(axis=1)
        n += mel.shape[1]
    mel_mean = mel_sum / n
    mel_std = np.sqrt(np.maximum(mel_sq / n - mel_mean ** 2, 1e-10))
    out = {"mel_mean": mel_mean.astype(np.float32),
           "mel_std": mel_std.astype(np.float32),
           "n_frames": n,
           "audio_config": dataclasses.asdict(raw_audio)}
    if include_linear:
        lin_mean = lin_sum / n
        out["linear_mean"] = lin_mean.astype(np.float32)
        out["linear_std"] = np.sqrt(
            np.maximum(lin_sq / n - lin_mean ** 2, 1e-10)).astype(np.float32)
    return out


def main(argv=None) -> None:
    from ..config import load_config
    from ..data.formatters import get_formatter

    parser = argparse.ArgumentParser()
    parser.add_argument("--config_path", required=True)
    parser.add_argument("--out_path", required=True)
    args = parser.parse_args(argv)
    cfg = load_config(args.config_path)
    items = []
    for ds in cfg.data.datasets:
        items.extend(get_formatter(ds.name)(ds.path, ds.meta_file_train))
    stats = compute_statistics(cfg, items)
    np.save(args.out_path, stats, allow_pickle=True)
    print(f" > {len(items)} clips, {stats['n_frames']} frames -> {args.out_path}")


if __name__ == "__main__":
    main()
