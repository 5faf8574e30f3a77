"""Vocoder spectrogram extraction (the reference ships this as a notebook,
e.g. ExtractTTSpectrogram.ipynb; SURVEY.md:116 — here an executable script).

Runs a trained TTS model TEACHER-FORCED over a corpus and dumps the
(ground-truth-aligned) predicted mel spectrograms + matching audio paths —
the training set for a neural vocoder, so the vocoder learns to invert the
TTS model's actual output distribution instead of ground-truth mels.

python notebooks/extract_spectrograms.py --config config.json \
    --checkpoint ckpt.npz --out out_specs/ [--limit N]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--limit", type=int, default=0)
    p.add_argument("--batch_size", type=int, default=16)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from your_voice_tts_tpu.audio import AudioProcessor
    from your_voice_tts_tpu.config import load_config
    from your_voice_tts_tpu.data import TTSDataset, load_meta_data
    from your_voice_tts_tpu.models import setup_model
    from your_voice_tts_tpu.text import phonemes, symbols
    from your_voice_tts_tpu.train.checkpoint import load_checkpoint

    cfg = load_config(args.config)
    ap = AudioProcessor(cfg.audio)
    train_items, eval_items = load_meta_data(cfg.data.datasets)
    items = train_items + eval_items
    if args.limit:
        items = items[: args.limit]
    num_chars = len(phonemes) if cfg.data.use_phonemes else len(symbols)
    model = setup_model(num_chars, 0, cfg)
    variables = model.init(jax.random.PRNGKey(0))
    params, state, _, meta = load_checkpoint(
        args.checkpoint, params=variables["params"],
        model_state=variables["state"], opt_state=None)
    variables = {"params": params, "state": state}
    r = meta.get("r", cfg.model.r)
    model.set_r(r)

    dataset = TTSDataset(items, cfg, ap)
    os.makedirs(args.out, exist_ok=True)
    rows = []
    n = 0
    for batch in dataset.batches(args.batch_size, r, shuffle=False):
        out = model.forward(
            variables, jnp.asarray(batch["text"]),
            jnp.asarray(batch["text_lengths"]), jnp.asarray(batch["mel"]),
            rng=None, train=False, r=r)
        mels = np.asarray(out["postnet_outputs"])
        for i in range(int(batch["n_real"])):
            L = int(batch["mel_lengths"][i])
            if L == 0:
                continue
            fn = f"spec_{n:06d}.npy"
            np.save(os.path.join(args.out, fn), mels[i, :L].T)  # [F, T]
            rows.append(fn)
            n += 1
    with open(os.path.join(args.out, "metadata.txt"), "w") as f:
        for i, fn in enumerate(rows):
            f.write(f"{fn}|{dataset.entries[i]['wav']}\n")
    print(f" > wrote {n} teacher-forced spectrograms to {args.out}")


if __name__ == "__main__":
    main()
