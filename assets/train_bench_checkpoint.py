"""Train and save the bench trained-latency checkpoint (see README.md
here). Deterministic recipe: smoke config, synthetic corpus with
trailing-silence clips and 3-14-word sentences.

Defaults reproduce the committed asset: 256 items, 25000 steps (TPU-trained;
--platform cpu reproduces it slower but bit-equivalently on the same jax
version since the model/data pipeline is platform-deterministic to float
tolerance).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ap_cli = argparse.ArgumentParser()
ap_cli.add_argument("--steps", type=int, default=25000)
ap_cli.add_argument("--n_items", type=int, default=256)
ap_cli.add_argument("--platform", default=None, help="cpu|tpu (default: auto)")
ap_cli.add_argument("--out", default="assets/bench_trained_smoke.npz")
ap_cli.add_argument("--corpus", default=".bench_cache/corpus")
args = ap_cli.parse_args()

import jax
if args.platform:
    jax.config.update("jax_platforms", args.platform)
import dataclasses, os
import jax.numpy as jnp, numpy as np
from your_voice_tts_tpu.config import load_config
from your_voice_tts_tpu.train.trainer import Trainer
from your_voice_tts_tpu.train.checkpoint import save_checkpoint
from your_voice_tts_tpu.infer.synthesis import text_to_seq

cfg = load_config("configs/smoke_synthetic.json")
import os
from your_voice_tts_tpu.data.synthetic import make_synthetic_corpus
corpus = args.corpus
if not os.path.exists(os.path.join(corpus, "metadata.csv")):
    make_synthetic_corpus(corpus, n_items=args.n_items, sr=22050, max_words=15)
ds = dataclasses.replace(cfg.data.datasets[0], path=corpus)
cfg = dataclasses.replace(
    cfg,
    model=dataclasses.replace(cfg.model, max_decoder_steps=256),
    training=dataclasses.replace(cfg.training, epochs=100000),
    data=dataclasses.replace(cfg.data, datasets=(ds,)))
trainer = Trainer(cfg, output_path=None, verbose=False)
# fit in chunks, saving after each: a remote-TPU stall mid-run then costs
# one chunk, not the whole run (round-5: the tunnel wedged 3.6k steps in).
# A restart resumes params/step from the partial asset (opt state restarts
# cold — acceptable for Adam at these scales, beats losing the run).
if os.path.exists(args.out) and os.environ.get("RESUME_PARTIAL") == "1":
    meta = trainer.restore(args.out, lenient=True)
    print(f" > resumed from {args.out} at step {meta.get('step')}",
          flush=True)
CHUNK = 20000
done = 0
while done < args.steps:
    done = min(done + CHUNK, args.steps)
    if int(trainer.state.step) >= done:
        continue
    trainer.fit(max_steps=done)  # fit()'s max_steps is a GLOBAL step target
    save_checkpoint(args.out,
                    params=trainer.state.params,
                    model_state=trainer.state.model_state, opt_state={},
                    step=int(trainer.state.step), epoch=0, r=cfg.model.r)
    print(f" > chunk saved at {done}/{args.steps} steps -> {args.out}",
          flush=True)
variables = {"params": trainer.state.params, "state": trainer.state.model_state}
for s in ["Hi there.", "The quick brown fox jumps over the lazy dog."]:
    seq = text_to_seq(s, cfg)
    out = trainer.model.inference(variables, jnp.asarray(seq, jnp.int32)[None],
                                  jnp.asarray([len(seq)], jnp.int32))
    sp = np.asarray(out["stop_probs"])[0]
    print(s, "-> mel_len", int(np.asarray(out["mel_lengths"])[0]),
          "cap", 512, "stop_max", round(float(sp.max()), 3), flush=True)
print(f"SAVED {args.out}")
