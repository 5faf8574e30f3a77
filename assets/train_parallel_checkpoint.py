"""Train and save the ParallelTTS quality-gate checkpoint (distillation
recipe, round-4 landing; round-5 scales corpus/steps — VERDICT r4 next #2).

Recipe (mirrors MIGRATION.md's distillation rows):
1. teacher-forced durations from the trained Tacotron2 teacher asset
   (assets/bench_trained_smoke.npz) over the SAME corpus it was trained on;
2. ParallelTTS trained on those durations via bin/train_parallel;
3. final params saved to assets/bench_trained_parallel.npz (the checkpoint
   bench.py quality_extras and tests/test_quality.py gate every round).

Run AFTER (re)training the teacher so the durations match its alignments:
    python assets/train_bench_checkpoint.py --steps 100000 --n_items 2048 \
        --corpus .bench_cache/corpus2048
    python assets/train_parallel_checkpoint.py --steps 30000 \
        --corpus .bench_cache/corpus2048
"""

import argparse
import os
import shutil
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

p = argparse.ArgumentParser()
p.add_argument("--steps", type=int, default=30000)
p.add_argument("--batch_size", type=int, default=32)
p.add_argument("--corpus", default=os.path.join(REPO, ".bench_cache",
                                                "corpus2048"))
p.add_argument("--teacher", default=os.path.join(HERE,
                                                 "bench_trained_smoke.npz"))
p.add_argument("--out", default=os.path.join(HERE,
                                             "bench_trained_parallel.npz"))
p.add_argument("--gst_energy", action="store_true",
               help="train the GST + energy-adaptor variant (round-5 "
                    "conditioning additions) — used for the held-out MCD "
                    "delta vs the plain parallel checkpoint")
p.add_argument("--durations", default=None,
               help="reuse an existing durations.npz instead of re-running "
                    "extraction (the GST variant reuses the plain run's)")
p.add_argument("--platform", default=None)
args = p.parse_args()

if args.gst_energy and args.out.endswith("bench_trained_parallel.npz"):
    args.out = os.path.join(HERE, "bench_trained_parallel_gst.npz")

import jax  # noqa: E402

if args.platform:
    jax.config.update("jax_platforms", args.platform)
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(REPO, ".jax_cache"))

import dataclasses  # noqa: E402
import json  # noqa: E402
import tempfile  # noqa: E402

from your_voice_tts_tpu.bin.extract_durations import main as extract_main
from your_voice_tts_tpu.bin.train_parallel import main as train_main
from your_voice_tts_tpu.config import load_config

assert os.path.exists(os.path.join(args.corpus, "metadata.csv")), (
    f"corpus {args.corpus} missing — train the teacher first (its script "
    f"generates the corpus)")
assert os.path.exists(args.teacher), args.teacher

smoke_cfg = os.path.join(REPO, "configs", "smoke_synthetic.json")
workdir = tempfile.mkdtemp(prefix="par_ckpt_")

# teacher config must match the teacher-training override (max_decoder_steps
# 256) or long items truncate their alignments
cfg = load_config(smoke_cfg)
cfg_over = os.path.join(workdir, "teacher_cfg.json")
with open(smoke_cfg) as f:
    raw = f.read()
with open(cfg_over, "w") as f:
    # JSON with // comments: strip them via the loader's regex is overkill —
    # just set the field through a flat override file
    import re
    raw2 = re.sub(r"(?m)^\s*//.*$", "", raw)
    d = json.loads(raw2)
    d["max_decoder_steps"] = 256
    if args.gst_energy:
        d["parallel_energy_predictor"] = True
        d["use_gst"] = True
        d["gst"] = {"gst_embedding_dim": 32, "gst_num_heads": 2,
                    "gst_style_tokens": 4}
    json.dump(d, f)

if args.durations:
    dur_path = args.durations
else:
    # cached next to the corpus so variant runs (--gst_energy) reuse it;
    # invalidated simply by deleting it or retraining into a new corpus dir
    dur_path = os.path.join(args.corpus, "durations_teacher.npz")
if not os.path.exists(dur_path):
    print(f" > extracting durations -> {dur_path}", flush=True)
    extract_main(["--config", cfg_over, "--checkpoint", args.teacher,
                  "--data_path", args.corpus, "--output", dur_path])
else:
    print(f" > reusing durations {dur_path}", flush=True)

outdir = os.path.join(workdir, "run")
print(f" > training ParallelTTS {args.steps} steps "
      f"(B={args.batch_size}, gst_energy={args.gst_energy})", flush=True)
train_main(["--config_path", cfg_over, "--data_path", args.corpus,
            "--durations", dur_path, "--max_steps", str(args.steps),
            "--batch_size", str(args.batch_size),
            "--output_path", outdir, "--save_step", str(args.steps)])

final = os.path.join(outdir, f"checkpoint_{args.steps}.npz")
if not os.path.exists(final):
    cands = sorted(os.listdir(outdir))
    final = os.path.join(outdir, cands[-1])
shutil.copyfile(final, args.out)
print(f"SAVED {args.out}", flush=True)
