"""Vocoder training CLI (reference vocoder/train.py).

python -m your_voice_tts_tpu.bin.train_vocoder --config_path voc.json \
    --data_path corpus/ [--model melgan|wavernn] [--max_steps N]
"""

from __future__ import annotations

import argparse


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(description="Train a neural vocoder")
    p.add_argument("--config_path", required=True)
    p.add_argument("--data_path", required=True,
                   help="corpus root (LJSpeech metadata layout)")
    p.add_argument("--meta_file", default="metadata.csv")
    p.add_argument("--output_path", default="runs-vocoder")
    p.add_argument("--restore_path", default=None)
    p.add_argument("--max_steps", type=int, default=None)
    args = p.parse_args(argv)

    from ..data.formatters import ljspeech
    from ..utils.io import create_experiment_folder
    from ..vocoder.config import load_vocoder_config

    cfg = load_vocoder_config(args.config_path)
    items = ljspeech(args.data_path, args.meta_file)
    out = create_experiment_folder(args.output_path, f"vocoder-{cfg.model}")

    if cfg.model == "melgan":
        from ..vocoder.train_gan import GANTrainer

        trainer = GANTrainer(cfg, items, output_path=out)
    else:
        from ..vocoder.train_wavernn import WaveRNNTrainer

        trainer = WaveRNNTrainer(cfg, items, output_path=out)
    if args.restore_path:
        trainer.restore(args.restore_path)
    trainer.fit(args.max_steps or cfg.training.epochs * max(1, len(items)))
    trainer.save(f"{out}/final.npz")
    print(f" > vocoder saved to {out}/final.npz")


if __name__ == "__main__":
    main()
