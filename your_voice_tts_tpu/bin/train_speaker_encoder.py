"""Speaker-encoder training CLI (reference speaker_encoder/train.py entry).

python -m your_voice_tts_tpu.bin.train_speaker_encoder --config tts.json \
    --data_path corpus/ --formatter ljspeech --max_steps 1000
"""

from __future__ import annotations

import argparse


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(description="Train the GE2E speaker encoder")
    p.add_argument("--config", required=True, help="TTS config (audio params)")
    p.add_argument("--data_path", required=True)
    p.add_argument("--formatter", default="ljspeech")
    p.add_argument("--meta_file", default="metadata.csv")
    p.add_argument("--output_path", default="runs-speaker-encoder")
    p.add_argument("--restore_path", default=None)
    p.add_argument("--max_steps", type=int, default=100_000)
    p.add_argument("--num_frames", type=int, default=160)
    p.add_argument("--num_speakers_per_batch", type=int, default=32)
    p.add_argument("--num_utters_per_speaker", type=int, default=10)
    p.add_argument("--lr", type=float, default=1e-4)
    args = p.parse_args(argv)

    from ..audio import AudioProcessor
    from ..config import load_config
    from ..data.formatters import get_formatter
    from ..speaker_encoder.dataset import SpeakerEncoderDataset
    from ..speaker_encoder.model import SpeakerEncoder
    from ..speaker_encoder.train import SpeakerEncoderTrainer
    from ..utils.io import create_experiment_folder

    cfg = load_config(args.config)
    ap = AudioProcessor(cfg.audio)
    items = get_formatter(args.formatter)(args.data_path, args.meta_file)
    dataset = SpeakerEncoderDataset(items, ap, num_frames=args.num_frames)
    model = SpeakerEncoder(input_dim=cfg.audio.num_mels)
    out = create_experiment_folder(args.output_path, "speaker-encoder")
    trainer = SpeakerEncoderTrainer(
        model, dataset, lr=args.lr,
        num_speakers_per_batch=args.num_speakers_per_batch,
        num_utters_per_speaker=args.num_utters_per_speaker, output_path=out)
    if args.restore_path:
        trainer.restore(args.restore_path)
    trainer.fit(args.max_steps)
    trainer.save(f"{out}/final.npz")
    print(f" > speaker encoder saved to {out}/final.npz")


if __name__ == "__main__":
    main()
