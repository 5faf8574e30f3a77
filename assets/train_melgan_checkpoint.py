"""Train and save the smoke MelGAN vocoder asset (round-5, VERDICT r4 next
#1: the waveform-domain quality gate needs a TRAINED neural vocoder).

GAN recipe on the synthetic smoke corpus (8 kHz, 20 mels, hop 64 — pairs
with configs/smoke_synthetic.json's TTS models): configs/melgan_smoke.json
generator/discriminator, LSGAN + multi-res STFT + feature matching.
Saved to assets/bench_trained_melgan.npz in the GANTrainer layout
({'g':..., 'd':...}); bench.py's copy-synthesis gate and the serving glue
load the generator subtree via VocoderSynthesizer.

    python assets/train_melgan_checkpoint.py [--steps 4000]
"""

import argparse
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

p = argparse.ArgumentParser()
p.add_argument("--steps", type=int, default=4000)
p.add_argument("--n_items", type=int, default=256)
p.add_argument("--corpus", default=os.path.join(REPO, ".bench_cache",
                                                "corpus_voc"))
p.add_argument("--out", default=os.path.join(HERE,
                                             "bench_trained_melgan.npz"))
p.add_argument("--platform", default=None)
args = p.parse_args()

import jax  # noqa: E402

if args.platform:
    jax.config.update("jax_platforms", args.platform)
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(REPO, ".jax_cache"))

import numpy as np  # noqa: E402

from your_voice_tts_tpu.data.formatters import ljspeech
from your_voice_tts_tpu.data.synthetic import make_synthetic_corpus
from your_voice_tts_tpu.vocoder.config import load_vocoder_config
from your_voice_tts_tpu.vocoder.train_gan import GANTrainer

if not os.path.exists(os.path.join(args.corpus, "metadata.csv")):
    make_synthetic_corpus(args.corpus, n_items=args.n_items, sr=8000,
                          max_words=12)
cfg = load_vocoder_config(os.path.join(REPO, "configs", "melgan_smoke.json"))
items = ljspeech(args.corpus, "metadata.csv")
trainer = GANTrainer(cfg, items, output_path=None)
last = trainer.fit(args.steps)
print(f" > final losses: { {k: round(float(v), 4) for k, v in last.items()} }",
      flush=True)
trainer.save(args.out)
print(f"SAVED {args.out}", flush=True)
