"""Training CLI (reference: python train.py --config_path config.json
[--restore_path ckpt]). SURVEY.md SS3.1.

python -m your_voice_tts_tpu.bin.train --config_path configs/x.json

There is no distribute.py equivalent: data parallelism is SPMD inside the
jitted step (parallel/mesh.py) — one process drives all local devices.
"""

from __future__ import annotations

import argparse
import os
import shutil


def main(argv: list[str] | None = None) -> None:
    parser = argparse.ArgumentParser(description="Train a TTS model on TPU")
    parser.add_argument("--config_path", required=True)
    parser.add_argument("--restore_path", default=None,
                        help="checkpoint to resume from (full state)")
    parser.add_argument("--continue_path", default=None,
                        help="experiment folder to re-enter")
    parser.add_argument("--max_steps", type=int, default=None,
                        help="stop after N optimizer steps (smoke runs)")
    parser.add_argument("--output_path", default=None,
                        help="override config output_path")
    args = parser.parse_args(argv)

    from ..config import check_config, load_config
    from ..train.trainer import Trainer
    from ..utils.io import create_experiment_folder

    cfg = load_config(args.config_path)
    check_config(cfg)

    if args.continue_path:
        out_path = args.continue_path
        ckpts = sorted(
            (f for f in os.listdir(out_path)
             if f.startswith("checkpoint_") and f.endswith(".npz")),
            key=lambda f: int(f.split("_")[1].split(".")[0]))
        restore = os.path.join(out_path, ckpts[-1]) if ckpts else None
    else:
        root = args.output_path or cfg.io.output_path
        out_path = create_experiment_folder(root, cfg.io.run_name)
        restore = args.restore_path
        shutil.copy(args.config_path, os.path.join(out_path, "config.json"))

    trainer = Trainer(cfg, output_path=out_path)
    if restore:
        meta = trainer.restore(restore, lenient=args.restore_path is not None)
        print(f" > Restored from {restore} (step {meta['step']})")
    trainer.fit(max_steps=args.max_steps)


if __name__ == "__main__":
    main()
