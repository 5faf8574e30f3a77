"""Corpus preprocessing CLI: precompute mel (and phoneme) caches.

The reference caches phonemizations under phoneme_cache_path lazily during
the first epoch; here a dedicated pass warms both caches through the jitted
DSP path so training startup is IO-bound only.

python -m your_voice_tts_tpu.bin.preprocess --config_path config.json \
    --cache_dir cache/
"""

from __future__ import annotations

import argparse
import os
import time


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(description="Precompute dataset caches")
    p.add_argument("--config_path", required=True)
    p.add_argument("--cache_dir", required=True)
    args = p.parse_args(argv)

    from ..audio import AudioProcessor
    from ..config import load_config
    from ..data import TTSDataset, load_meta_data

    cfg = load_config(args.config_path)
    ap = AudioProcessor(cfg.audio)
    items, eval_items = load_meta_data(cfg.data.datasets)
    os.makedirs(args.cache_dir, exist_ok=True)
    t0 = time.time()
    ds = TTSDataset(items + eval_items, cfg, ap, cache_dir=args.cache_dir)
    dt = time.time() - t0
    total_frames = sum(e["mel_len"] for e in ds.entries)
    print(f" > cached {len(ds)} utterances / {total_frames} mel frames "
          f"in {dt:.1f}s -> {args.cache_dir}")


if __name__ == "__main__":
    main()
