"""Export the end-to-end serving program to StableHLO artifacts.

python -m your_voice_tts_tpu.bin.export_serving --config cfg.json \
    --checkpoint ckpt.npz --out exported/ [--batch 1 8] [--text_bucket 128] \
    [--platforms cpu tpu] [--max_decoder_steps N]

Writes one self-contained artifact per (batch, text-bucket) shape plus a
manifest (infer/export.py). Serve with ExportedSynthesizer(out_dir) — no
model code or checkpoint needed at serving time.
"""

from __future__ import annotations

import argparse


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(description="AOT-export the serving program")
    p.add_argument("--config", required=True)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--batch", type=int, nargs="+", default=[1])
    p.add_argument("--text_bucket", type=int, nargs="+", default=[128])
    p.add_argument("--platforms", nargs="+", default=["cpu", "tpu"])
    p.add_argument("--max_decoder_steps", type=int, default=None)
    p.add_argument("--vocoder_config", default=None,
                   help="bake a MelGAN/PWGAN generator in place of "
                        "Griffin-Lim")
    p.add_argument("--vocoder_checkpoint", default=None)
    p.add_argument("--speakers_json", default=None,
                   help="multi-speaker export: adds a speaker input "
                        "(d-vectors if the json carries embeddings, ids "
                        "otherwise) and records the table in the manifest")
    p.add_argument("--speaker_encoder_checkpoint", default=None,
                   help="also export the GE2E encoder (mel windows -> "
                        "d-vectors) into the same directory, making the "
                        "cloning pipeline artifact-only")
    p.add_argument("--se_num_frames", type=int, default=160)
    p.add_argument("--style_frames", type=int, default=None,
                   help="GST models: add a style-reference mel input of "
                        "this many frames to the artifact")
    p.add_argument("--pallas", action="store_true",
                   help="bake the Pallas kernel fast paths in (decode + "
                        "Griffin-Lim); implies --platforms tpu")
    args = p.parse_args(argv)

    from ..infer.export import export_serving
    from ..infer.synthesizer import Synthesizer

    synth = Synthesizer(args.config, args.checkpoint,
                        vocoder_config=args.vocoder_config,
                        vocoder_checkpoint=args.vocoder_checkpoint,
                        speakers_json=args.speakers_json)
    speaker_mode = d_dim = speakers = None
    if synth.speaker_embeddings:
        speaker_mode = "dvector"
        speakers = synth.speaker_embeddings
        d_dim = len(next(iter(speakers.values())))
    elif synth.speaker_ids:
        speaker_mode, speakers = "id", synth.speaker_ids
    manifest = export_serving(
        synth.model, synth.variables, synth.cfg, synth.ap, args.out,
        batch_sizes=tuple(args.batch), text_buckets=tuple(args.text_bucket),
        max_decoder_steps=args.max_decoder_steps,
        platforms=("tpu",) if args.pallas else tuple(args.platforms),
        vocoder=synth.vocoder,
        speaker_mode=speaker_mode, d_dim=d_dim, speakers=speakers,
        style_frames=args.style_frames, use_pallas=args.pallas)
    print(f"exported {len(manifest['entries'])} artifact(s) to {args.out}")

    if args.speaker_encoder_checkpoint:
        from ..infer.export import export_speaker_encoder
        from ..speaker_encoder.model import load_encoder

        enc, eparams = load_encoder(args.speaker_encoder_checkpoint,
                                    default_input_dim=synth.cfg.audio.num_mels)
        se = export_speaker_encoder(enc, eparams, args.out,
                                    input_dim=enc.layers[0].in_dim,
                                    num_frames=args.se_num_frames,
                                    platforms=tuple(args.platforms))
        print(f"exported speaker encoder ({len(se['entries'])} artifact(s))")


if __name__ == "__main__":
    main()
