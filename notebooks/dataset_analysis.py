"""Dataset analysis (the reference ships notebooks/dataset_analysis/
AnalyzeDataset.ipynb; SURVEY.md:116 — here an executable script).

Reports the corpus statistics that decide TTS training configs: clip-length
and text-length distributions, audio-seconds per character (the speaking-rate
proxy the upstream notebook plots), character coverage vs the symbol table,
and suggested min/max_seq_len cutoffs.

python notebooks/dataset_analysis.py --config config.json [--hist]
"""

from __future__ import annotations

import argparse
import os
import sys
import wave
from collections import Counter

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def wav_duration(path: str) -> float:
    with wave.open(path, "rb") as f:
        return f.getnframes() / f.getframerate()


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--hist", action="store_true", help="ASCII histograms")
    args = p.parse_args()

    from your_voice_tts_tpu.config import load_config
    from your_voice_tts_tpu.data import load_meta_data
    from your_voice_tts_tpu.text import symbols

    cfg = load_config(args.config)
    train_items, eval_items = load_meta_data(cfg.data.datasets)
    items = train_items + eval_items
    print(f" > {len(items)} clips ({len(train_items)} train / {len(eval_items)} eval)")

    text_lens = np.array([len(t) for t, _, _ in items])
    durs = np.array([wav_duration(w) for _, w, _ in items])
    secs_per_char = durs / np.maximum(text_lens, 1)
    speakers = Counter(s for _, _, s in items)

    def stats(name, x, unit=""):
        print(f" > {name}: min {x.min():.2f} / p50 {np.median(x):.2f} / "
              f"mean {x.mean():.2f} / p95 {np.percentile(x, 95):.2f} / "
              f"max {x.max():.2f} {unit}")

    stats("text length", text_lens.astype(float), "chars")
    stats("clip duration", durs, "s")
    stats("sec/char", secs_per_char, "s")
    print(f" > total audio: {durs.sum() / 3600.0:.2f} h; "
          f"speakers: {len(speakers)}")
    for spk, n in speakers.most_common(10):
        print(f"     {spk}: {n} clips")

    # character coverage vs the symbol table
    corpus_chars = Counter("".join(t for t, _, _ in items))
    known = set(symbols)
    unknown = {c: n for c, n in corpus_chars.items() if c not in known}
    if unknown:
        print(f" > {len(unknown)} characters NOT in the symbol table "
              f"(will be dropped): {sorted(unknown)[:40]}")
    else:
        print(" > full character coverage by the symbol table")

    lo, hi = int(np.percentile(text_lens, 1)), int(np.percentile(text_lens, 99))
    print(f" > suggested min_seq_len/max_seq_len: {max(lo, 2)} / {hi}")

    if args.hist:
        for name, x in [("text chars", text_lens), ("duration s", durs)]:
            counts, edges = np.histogram(x, bins=20)
            top = counts.max() or 1
            print(f"\n {name} histogram:")
            for c, e in zip(counts, edges):
                print(f"  {e:8.1f} | {'#' * int(40 * c / top)} {c}")


if __name__ == "__main__":
    main()
