"""Batch synthesis CLI (reference synthesize.py; SURVEY.md SS3.3).

python -m your_voice_tts_tpu.bin.synthesize "Text to speak." config.json \
    checkpoint.npz out_dir/ [--speaker_id N] [--speakers_json speakers.json]
"""

from __future__ import annotations

import argparse
import os


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(description="Synthesize speech from text")
    p.add_argument("text", help="text, or path to a file with one sentence per line")
    p.add_argument("config_path")
    p.add_argument("checkpoint_path")
    p.add_argument("out_path")
    p.add_argument("--speaker_id", default=None)
    p.add_argument("--speakers_json", default=None)
    p.add_argument("--vocoder_config", default=None)
    p.add_argument("--vocoder_checkpoint", default=None)
    args = p.parse_args(argv)

    from ..infer.synthesizer import Synthesizer

    synth = Synthesizer(args.config_path, args.checkpoint_path,
                        vocoder_config=args.vocoder_config,
                        vocoder_checkpoint=args.vocoder_checkpoint,
                        speakers_json=args.speakers_json)
    if os.path.isfile(args.text):
        with open(args.text, encoding="utf-8") as f:
            texts = [l.strip() for l in f if l.strip()]
    else:
        texts = [args.text]

    os.makedirs(args.out_path, exist_ok=True)
    for i, text in enumerate(texts):
        wav = synth.tts(text, speaker=args.speaker_id)
        out = os.path.join(args.out_path, f"out_{i:03d}.wav")
        synth.ap.save_wav(wav, out)
        print(f" > {out}  ({len(wav) / synth.ap.sample_rate:.2f}s)  <- {text[:60]!r}")


if __name__ == "__main__":
    main()
