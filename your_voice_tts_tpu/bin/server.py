"""Server CLI (reference server/server.py entry).

python -m your_voice_tts_tpu.bin.server --tts_config c.json --tts_checkpoint m.npz
python -m your_voice_tts_tpu.bin.server --export_dir exported/   # AOT artifact
"""

from __future__ import annotations

import argparse


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(description="TTS HTTP server")
    p.add_argument("--tts_config", default=None)
    p.add_argument("--export_dir", default=None,
                   help="serve from an export_serving artifact directory "
                        "instead of a config+checkpoint")
    p.add_argument("--tts_checkpoint", default=None)
    p.add_argument("--vocoder_config", default=None)
    p.add_argument("--vocoder_checkpoint", default=None)
    p.add_argument("--speakers_json", default=None)
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=5002)
    p.add_argument("--max_batch", type=int, default=8,
                   help="dynamic micro-batching: max concurrent requests "
                        "coalesced into one device batch (1 disables)")
    p.add_argument("--max_delay_ms", type=float, default=25.0,
                   help="how long to hold the first request for batchmates")
    args = p.parse_args(argv)

    from ..infer.server import make_server

    if (args.export_dir is None) == (args.tts_config is None):
        p.error("pass exactly one of --tts_config or --export_dir")
    if args.export_dir is not None:
        from ..infer.export import ExportedSynthesizer

        synth = ExportedSynthesizer(args.export_dir)
    else:
        from ..infer.synthesizer import Synthesizer

        synth = Synthesizer(args.tts_config, args.tts_checkpoint,
                            vocoder_config=args.vocoder_config,
                            vocoder_checkpoint=args.vocoder_checkpoint,
                            speakers_json=args.speakers_json)
    server = make_server(synth, args.host, args.port,
                         max_batch=args.max_batch,
                         max_delay_ms=args.max_delay_ms)
    print(f" > Serving on http://{args.host}:{args.port}  (GET /api/tts?text=...)")
    server.serve_forever()


if __name__ == "__main__":
    main()
