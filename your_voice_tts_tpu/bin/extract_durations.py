"""Teacher-duration extraction for ParallelTTS training.

python -m your_voice_tts_tpu.bin.extract_durations \
    --config tts_config.json --checkpoint taco2.npz --data_path corpus/ \
    --output durations.npz

Runs the trained (autoregressive) Tacotron2 teacher-forced over the corpus
and converts each item's attention alignment into integer per-token
durations: every decoder step attends argmax to one token; a step's r mel
frames are credited to that token. Durations are then repaired to sum
EXACTLY to the item's mel length (residual frames go to the most-attended
tokens) — the ParallelTTS length regulator needs exact totals.

This is the standard FastSpeech-style distillation recipe re-expressed on
the rebuild's own stack (no reference equivalent exists; the reference has
no parallel family). Output: one .npz mapping item id -> int32 [T_tokens].
"""

from __future__ import annotations

import argparse
import os


def durations_from_alignment(align, n_tokens: int, mel_len: int, r: int):
    """[steps, T_text] alignment -> int32 [n_tokens] durations summing to
    mel_len. Steps beyond the mel length are ignored; frames are assigned
    r-at-a-time by argmax token, then the total is repaired."""
    import numpy as np

    steps_needed = -(-mel_len // r)
    am = np.asarray(align)[:steps_needed, :n_tokens].argmax(axis=1)
    d = np.zeros((n_tokens,), np.int64)
    for t in am:
        d[t] += r
    # repair: the last r-group may overshoot mel_len; trim from the final
    # attended token, never below zero
    excess = int(d.sum()) - mel_len
    t = len(am) - 1
    while excess > 0 and t >= 0:
        take = min(excess, int(d[am[t]]))
        d[am[t]] -= take
        excess -= take
        t -= 1
    # degenerate alignments (untrained teacher): push any leftover onto
    # the most-attended token
    if int(d.sum()) != mel_len:
        d[int(np.argmax(d))] += mel_len - int(d.sum())
    return d.astype(np.int32)


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(description="Extract ParallelTTS durations")
    p.add_argument("--config", required=True)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--data_path", required=True)
    p.add_argument("--meta_file", default="metadata.csv")
    p.add_argument("--output", default="durations.npz")
    p.add_argument("--batch_size", type=int, default=16)
    args = p.parse_args(argv)

    import dataclasses

    import jax
    import numpy as np

    from ..audio import AudioProcessor
    from ..config import load_config
    from ..data.dataset import TTSDataset
    from ..data.formatters import load_meta_data
    from ..models import setup_model
    from ..text import symbols
    from ..train.checkpoint import load_checkpoint

    cfg = load_config(args.config)
    ds0 = dataclasses.replace(cfg.data.datasets[0], path=args.data_path,
                              meta_file_train=args.meta_file)
    cfg = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, datasets=(ds0,)))
    items, _ = load_meta_data(cfg.data.datasets, eval_split=False)
    ap = AudioProcessor(cfg.audio)
    dataset = TTSDataset(items, cfg, ap)

    model = setup_model(len(symbols), 0, cfg)
    variables = model.init(jax.random.PRNGKey(0))
    params, state, _, meta = load_checkpoint(
        args.checkpoint, params=variables["params"],
        model_state=variables["state"], opt_state=None)
    r = int(meta.get("r", cfg.model.r))
    model.set_r(r)

    fwd = jax.jit(lambda v, t, tl, m, ml: model.forward(
        v, t, tl, m, rng=None, train=False, r=r, mel_lengths=ml))

    # iterate entries directly (stable wav-basename keys; batches() keeps
    # no item identity) — groups stay length-sorted, so bucket shapes match
    # what training used
    out: dict[str, np.ndarray] = {}
    ents = dataset.entries
    for s in range(0, len(ents), args.batch_size):
        if (s // args.batch_size) % 8 == 0:
            # progress heartbeat: bucket-shape compiles make large corpora
            # silent for many minutes otherwise (and stall watchdogs that
            # key on log growth then kill a healthy run)
            print(f" > durations {s}/{len(ents)}", flush=True)
        group = ents[s: s + args.batch_size]
        batch = dataset._collate(group, len(group), r)
        res = fwd({"params": params, "state": state}, batch["text"],
                  batch["text_lengths"], batch["mel"], batch["mel_lengths"])
        aligns = np.asarray(res["alignments"])      # [B, steps, T_text]
        for i, e in enumerate(group):
            tl = int(batch["text_lengths"][i])
            ml = int(batch["mel_lengths"][i])
            key = os.path.splitext(os.path.basename(e["wav"]))[0]
            out[key] = durations_from_alignment(aligns[i], tl, ml, r)
    np.savez(args.output, **out)
    print(f" > wrote {len(out)} duration rows -> {args.output}")


if __name__ == "__main__":
    main()
