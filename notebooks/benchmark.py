"""Benchmark / QA walkthrough (the reference ships this as
notebooks/Benchmark.ipynb; here it is an executable, documented script).

Synthesizes a set of sentences with a trained checkpoint, reports timing
(RTF, mel frames/s), alignment-diagonality per sentence, and writes wavs +
alignment/spectrogram plots for listening/inspection.

python notebooks/benchmark.py --config config.json --checkpoint ckpt.npz \
    [--vocoder_config voc.json --vocoder_checkpoint voc.npz] --out out/
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SENTENCES = [
    "The quick brown fox jumps over the lazy dog.",
    "Printing, in the only sense with which we are at present concerned, "
    "differs from most if not from all the arts.",
    "Speech synthesis on tensor processing units is remarkably fast.",
    "Be a voice, not an echo.",
    "A quarter of a century has passed since the first edition appeared.",
]


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--vocoder_config", default=None)
    p.add_argument("--vocoder_checkpoint", default=None)
    p.add_argument("--speakers_json", default=None)
    p.add_argument("--speaker", default=None)
    p.add_argument("--out", default="benchmark_out")
    args = p.parse_args()

    import numpy as np

    from your_voice_tts_tpu.infer.synthesizer import Synthesizer
    from your_voice_tts_tpu.infer.synthesis import synthesis
    from your_voice_tts_tpu.utils.measures import alignment_diagonal_score
    from your_voice_tts_tpu.utils.visual import plot_alignment, plot_spectrogram

    os.makedirs(args.out, exist_ok=True)
    synth = Synthesizer(args.config, args.checkpoint,
                        vocoder_config=args.vocoder_config,
                        vocoder_checkpoint=args.vocoder_checkpoint,
                        speakers_json=args.speakers_json)

    # warm-up compile
    synth.tts(SENTENCES[0])

    total_audio, total_wall = 0.0, 0.0
    for i, text in enumerate(SENTENCES):
        t0 = time.time()
        res = synthesis(synth.model, synth.variables, text, synth.cfg, synth.ap,
                        use_griffin_lim=synth.vocoder is None,
                        vocoder=synth.vocoder.mel_to_wav if synth.vocoder else None)
        dt = time.time() - t0
        wav = res["wav"]
        dur = len(wav) / synth.ap.sample_rate
        total_audio += dur
        total_wall += dt
        score = alignment_diagonal_score(np.asarray(res["alignment"]))
        print(f"[{i}] {dur:5.2f}s audio in {dt:5.2f}s "
              f"(RTF {dur / dt:6.1f}x) align {score:.3f} | {text[:60]}")
        synth.ap.save_wav(wav, os.path.join(args.out, f"sent_{i}.wav"))
        plot_alignment(res["alignment"]).savefig(
            os.path.join(args.out, f"align_{i}.png"))
        plot_spectrogram(res["mel_postnet_spec"]).savefig(
            os.path.join(args.out, f"spec_{i}.png"))

    print(f"\nTOTAL: {total_audio:.1f}s audio / {total_wall:.1f}s wall "
          f"= {total_audio / total_wall:.1f}x realtime (sequential, batch=1)")
    print(f"outputs in {args.out}/")


if __name__ == "__main__":
    main()
