"""Convert a reference torch checkpoint (.pth.tar) to this framework's .npz.

python -m your_voice_tts_tpu.bin.import_checkpoint ckpt.pth.tar config.json \
    out.npz [--num_speakers N --speaker_embedding_dim D]

Reads the reference pickle ({"model": state_dict, "r", "step", ...} —
reference utils/io.py save_checkpoint), converts layouts/names through
utils/torch_import.convert_tacotron2_state_dict, and writes a checkpoint
loadable by every consumer here (bin/synthesize, bin/server, bin/train
--restore_path). Unmapped source keys are printed loudly — a fork that
renamed modules shows up as a report, not silent zeros.
"""

from __future__ import annotations

import argparse


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(
        description="Import a reference torch checkpoint to npz")
    p.add_argument("torch_checkpoint")
    p.add_argument("config_path")
    p.add_argument("out_path")
    p.add_argument("--num_speakers", type=int, default=0)
    p.add_argument("--speaker_embedding_dim", type=int, default=0)
    args = p.parse_args(argv)

    import jax

    from ..config import load_config
    from ..models import setup_model
    from ..text import phonemes, symbols
    from ..train.checkpoint import save_checkpoint
    from ..utils.torch_import import (convert_tacotron2_state_dict,
                                      load_torch_state_dict)

    cfg = load_config(args.config_path)
    sd, meta = load_torch_state_dict(args.torch_checkpoint)
    num_chars = len(phonemes) if cfg.data.use_phonemes else len(symbols)
    model = setup_model(num_chars, args.num_speakers, cfg,
                        args.speaker_embedding_dim)
    variables = model.init(jax.random.PRNGKey(0))
    variables, report = convert_tacotron2_state_dict(sd, variables)

    print(f"mapped {report['mapped']} source tensors")
    if report["unused_source_keys"]:
        print("WARNING: NOT transferred (no matching target):")
        for k in report["unused_source_keys"]:
            print(f"  - {k}")
    if report["shape_mismatches"]:
        print("WARNING: shape mismatches (kept init values):")
        for k in report["shape_mismatches"]:
            print(f"  - {k}")

    save_checkpoint(
        args.out_path, params=variables["params"],
        model_state=variables["state"], opt_state={},
        step=int(meta.get("step", 0)), epoch=int(meta.get("epoch", 0)),
        r=int(meta.get("r", cfg.model.r)),
        extra={"imported_from": args.torch_checkpoint})
    print(f"wrote {args.out_path}")


if __name__ == "__main__":
    main()
