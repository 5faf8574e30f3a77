"""d-vector extraction CLI (reference speaker_encoder/compute_embeddings.py;
SURVEY.md SS3.5 offline path):

python -m your_voice_tts_tpu.bin.compute_embeddings \
    --checkpoint se.npz --config tts_config.json --data_path corpus/ \
    --formatter synthetic --output speakers.json

Writes speakers.json mapping {speaker: {clip_id: {"embedding": [...]}}} —
the file multi-speaker TTS training consumes for external d-vectors.
"""

from __future__ import annotations

import argparse
import json
import os


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(description="Compute speaker d-vectors")
    p.add_argument("--checkpoint", default=None,
                   help="speaker-encoder checkpoint (random init if omitted)")
    p.add_argument("--config", required=True, help="TTS config (audio params)")
    p.add_argument("--data_path", required=True)
    p.add_argument("--formatter", default="ljspeech")
    p.add_argument("--meta_file", default="metadata.csv")
    p.add_argument("--output", default="speakers.json")
    p.add_argument("--num_frames", type=int, default=160)
    args = p.parse_args(argv)

    import jax
    import numpy as np

    from ..audio import AudioProcessor
    from ..config import load_config
    from ..data.formatters import get_formatter
    from ..speaker_encoder.model import SpeakerEncoder
    from ..train.checkpoint import load_checkpoint

    cfg = load_config(args.config)
    ap = AudioProcessor(cfg.audio)
    # imported reference encoders record their architecture in the meta
    # (bin/import_checkpoint --kind speaker_encoder); honor it so the
    # template matches before load_checkpoint
    if args.checkpoint:
        from ..speaker_encoder.model import load_encoder
        model, params = load_encoder(args.checkpoint,
                                     default_input_dim=cfg.audio.num_mels)
    else:
        model = SpeakerEncoder(input_dim=cfg.audio.num_mels)
        params = model.init(jax.random.PRNGKey(0))

    items = get_formatter(args.formatter)(args.data_path, args.meta_file)
    mapping: dict = {}
    import jax.numpy as jnp

    embed = jax.jit(lambda m: model.compute_embedding(params, m,
                                                      args.num_frames))
    for text, wav_path, speaker in items:
        wav = ap.load_wav(wav_path)
        mel = ap.melspectrogram(wav).T.astype(np.float32)
        if mel.shape[0] < args.num_frames:
            mel = np.tile(mel, (-(-args.num_frames // mel.shape[0]), 1))
        # fixed window count per clip keeps jit cache small: use first window
        e = np.asarray(embed(jnp.asarray(mel[: args.num_frames])))
        clip = os.path.splitext(os.path.basename(wav_path))[0]
        mapping.setdefault(speaker, {})[clip] = {"embedding": e.tolist()}
        print(f" > {speaker}/{clip}")

    with open(args.output, "w", encoding="utf-8") as f:
        json.dump(mapping, f)
    print(f" > wrote {args.output} ({len(mapping)} speakers)")


if __name__ == "__main__":
    main()
