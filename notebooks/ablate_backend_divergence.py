"""Ablate the CPU-vs-TPU free-run quality divergence (VERDICT r4 next #4).

Round 4 measured the SAME Tacotron2 checkpoint at MCD 7.61 dB (TPU) vs
11.35 dB (CPU scan) on the held-out protocol — a 3.7 dB gap attributed to
"backend numerics" without identifying the driver. This script separates
the candidate knobs by measuring held-out MCD per inference route:

  - kernel  : the weights-in-VMEM Pallas decode kernel (TPU serving default)
  - scan-f32: the XLA lax.scan route, float32 matmuls
  - scan-bf16: the scan route with bfloat16 compute_dtype

on whichever backend this process runs (TPU under the axon tunnel, CPU with
JAX_PLATFORMS=cpu), writing one JSON line per route to stdout. Run it on
both backends and diff:

  python notebooks/ablate_backend_divergence.py            # TPU
  JAX_PLATFORMS=cpu python notebooks/ablate_backend_divergence.py  # CPU

Interpretation contract (what the measurements mean):
  - if CPU scan-f32 and TPU scan-f32 agree but the TPU kernel differs, the
    kernel route (not the backend) drives the gap;
  - if CPU scan-f32 vs TPU scan-f32 already shows the gap, the driver is
    backend matmul/accumulation numerics amplified by the free-run
    feedback loop (each step's mel feeds the next prenet — a chaotic map
    where 1e-6 route differences exponentiate into different trajectories);
  - scan-bf16 vs scan-f32 on ONE backend bounds the precision term alone.

The free-run loop is the amplifier either way: per-step numerics are gated
tightly elsewhere (bench --verify decode gates at <=0.0088 rel err); this
script quantifies how far the AMPLIFIED trajectories drift in quality
terms, which is what a user hears.
"""

import dataclasses
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from your_voice_tts_tpu.audio import AudioProcessor
from your_voice_tts_tpu.config import load_config
from your_voice_tts_tpu.data.formatters import synthetic as synthetic_fmt
from your_voice_tts_tpu.data.synthetic import make_synthetic_corpus
from your_voice_tts_tpu.infer.synthesis import text_to_seq
from your_voice_tts_tpu.models import setup_model
from your_voice_tts_tpu.text import symbols
from your_voice_tts_tpu.train.checkpoint import load_checkpoint
from your_voice_tts_tpu.utils.quality import mel_cepstral_distortion

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main(n_items: int = 16):
    ckpt = os.path.join(REPO, "assets", "bench_trained_smoke.npz")
    cfg = load_config(os.path.join(REPO, "configs", "smoke_synthetic.json"))
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, max_decoder_steps=256))
    model = setup_model(len(symbols), 0, cfg)
    variables = model.init(jax.random.PRNGKey(0))
    params, state, _, meta = load_checkpoint(
        ckpt, params=variables["params"], model_state=variables["state"],
        opt_state=None)
    variables = {"params": params, "state": state}
    model.set_r(meta.get("r", cfg.model.r))
    ap = AudioProcessor(cfg.audio)
    backend = jax.default_backend()

    routes = {
        "scan_f32": dict(use_pallas=False, compute_dtype=None),
        "scan_bf16": dict(use_pallas=False, compute_dtype=jnp.bfloat16),
    }
    if backend == "tpu":
        routes["kernel"] = dict(use_pallas=True, compute_dtype=None)

    with tempfile.TemporaryDirectory() as tmp:
        make_synthetic_corpus(tmp, n_items=n_items,
                              sr=cfg.audio.sample_rate,
                              seed=20260817, max_words=10)
        items = synthetic_fmt(tmp)
        per_route_mcd = {r: [] for r in routes}
        per_route_len = {r: [] for r in routes}
        for text, wav_path, _spk in items:
            wav = ap.load_wav(wav_path)
            gt_mel = ap.melspectrogram(wav).T
            seq = text_to_seq(text, cfg)
            for rname, kw in routes.items():
                out = model.inference(
                    variables, jnp.asarray(seq, jnp.int32)[None],
                    jnp.asarray([len(seq)], jnp.int32), **kw)
                n = int(out["mel_lengths"][0]) or \
                    out["postnet_outputs"].shape[1]
                pred = np.asarray(out["postnet_outputs"][0, :n], np.float32)
                per_route_mcd[rname].append(mel_cepstral_distortion(
                    pred, gt_mel, cfg=cfg.audio,
                    stats=getattr(ap, "mel_stats", None)))
                per_route_len[rname].append(n)
    for rname in routes:
        print(json.dumps({
            "backend": backend,
            "route": rname,
            "mcd_mean_db": round(float(np.mean(per_route_mcd[rname])), 3),
            "mcd_worst_db": round(float(np.max(per_route_mcd[rname])), 3),
            "mean_frames": round(float(np.mean(per_route_len[rname])), 1),
            "n_items": n_items,
        }), flush=True)


if __name__ == "__main__":
    main()
