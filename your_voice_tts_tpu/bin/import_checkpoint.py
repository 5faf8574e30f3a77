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
    p.add_argument("--kind",
                   choices=["tacotron2", "speaker_encoder", "wavernn",
                            "melgan", "pwgan"],
                   default="tacotron2")
    p.add_argument("--num_speakers", type=int, default=0)
    p.add_argument("--speaker_embedding_dim", type=int, default=0)
    args = p.parse_args(argv)

    import jax

    from ..config import load_config
    from ..models import setup_model
    from ..text import phonemes, symbols
    from ..train.checkpoint import save_checkpoint
    from ..utils.torch_import import (convert_speaker_encoder_state_dict,
                                      convert_tacotron2_state_dict,
                                      load_torch_state_dict)

    sd, meta = load_torch_state_dict(args.torch_checkpoint)

    if args.kind == "melgan":
        from ..utils.torch_import import convert_melgan_state_dict
        from ..vocoder.config import load_vocoder_config
        from ..vocoder.models.melgan import MelganGenerator

        vcfg = load_vocoder_config(args.config_path)
        g = vcfg.melgan
        model = MelganGenerator(vcfg.audio.num_mels, g.upsample_factors,
                                g.base_channels, g.num_res_blocks,
                                g.kernel_size)
        params = model.init(jax.random.PRNGKey(0))
        params, report = convert_melgan_state_dict(sd, params)
        print(f"mapped {report['mapped']} source tensors")
        if report["unused_source_keys"]:
            print("WARNING: NOT transferred (no matching target):")
            for k in report["unused_source_keys"]:
                print(f"  - {k}")
        # the GAN trainer's checkpoint layout keys the generator under 'g'
        # (vocoder/synthesizer._restore_generator_subtree)
        save_checkpoint(args.out_path, params={"g": params}, model_state={},
                        opt_state={}, step=int(meta.get("step", 0)),
                        epoch=int(meta.get("epoch", 0)), r=1,
                        extra={"imported_from": args.torch_checkpoint})
        print(f"wrote {args.out_path}")
        return

    if args.kind == "pwgan":
        from ..utils.torch_import import convert_pwgan_state_dict
        from ..vocoder.config import load_vocoder_config
        from ..vocoder.models.pwgan import ParallelWaveganGenerator

        vcfg = load_vocoder_config(args.config_path)
        g = vcfg.pwgan
        model = ParallelWaveganGenerator(
            vcfg.audio.num_mels, g.num_layers, g.stacks, g.residual_channels,
            g.gate_channels, g.skip_channels, g.kernel_size,
            g.upsample_factors, aux_context_window=g.aux_context_window)
        params = model.init(jax.random.PRNGKey(0))
        params, report = convert_pwgan_state_dict(sd, params)
        print(f"mapped {report['mapped']} source tensors")
        if report["unused_source_keys"]:
            print("WARNING: NOT transferred (no matching target):")
            for k in report["unused_source_keys"]:
                print(f"  - {k}")
        save_checkpoint(args.out_path, params={"g": params}, model_state={},
                        opt_state={}, step=int(meta.get("step", 0)),
                        epoch=int(meta.get("epoch", 0)), r=1,
                        extra={"imported_from": args.torch_checkpoint})
        print(f"wrote {args.out_path}")
        return

    if args.kind == "wavernn":
        from ..utils.torch_import import convert_wavernn_state_dict
        from ..vocoder.config import load_vocoder_config
        from ..vocoder.models.wavernn import WaveRNN

        vcfg = load_vocoder_config(args.config_path)
        w = vcfg.wavernn
        model = WaveRNN(vcfg.audio.num_mels, w.bits, w.rnn_dims, w.fc_dims,
                        w.compute_dims, w.res_out_dims, w.num_res_blocks,
                        w.pad, w.upsample_factors, w.mode,
                        num_mixtures=w.num_mixtures)
        params = model.init(jax.random.PRNGKey(0))
        params, report = convert_wavernn_state_dict(sd, params)
        extra = {"imported_from": args.torch_checkpoint}
        print(f"mapped {report['mapped']} source tensors")
        if report["unused_source_keys"]:
            print("WARNING: NOT transferred (no matching target):")
            for k in report["unused_source_keys"]:
                print(f"  - {k}")
        save_checkpoint(args.out_path, params=params, model_state={},
                        opt_state={}, step=int(meta.get("step", 0)),
                        epoch=int(meta.get("epoch", 0)), r=1, extra=extra)
        print(f"wrote {args.out_path}")
        return

    cfg = load_config(args.config_path)

    if args.kind == "speaker_encoder":
        from ..speaker_encoder.model import SpeakerEncoder

        # size the encoder from the source tensors themselves:
        # weight_ih_l0 [4H, in], linear.weight [proj, H]
        wih = next(v for k, v in sd.items() if k.endswith("lstm.weight_ih_l0")
                   and k.startswith("layers.0"))
        lin = next(v for k, v in sd.items() if "layers.0.linear" in k
                   and k.endswith("weight"))
        n_layers = 1 + max(int(k.split(".")[1]) for k in sd
                           if k.startswith("layers."))
        arch = {"input_dim": int(wih.shape[1]),
                "lstm_dim": int(wih.shape[0] // 4),
                "proj_dim": int(lin.shape[0]), "num_layers": n_layers,
                "recur_on_proj": False}
        model = SpeakerEncoder(**arch)
        params = model.init(jax.random.PRNGKey(0))
        params, report = convert_speaker_encoder_state_dict(sd, params)
        variables = {"params": params, "state": {}}
        extra = {"imported_from": args.torch_checkpoint,
                 "speaker_encoder": arch}
    else:
        num_chars = len(phonemes) if cfg.data.use_phonemes else len(symbols)
        model = setup_model(num_chars, args.num_speakers, cfg,
                            args.speaker_embedding_dim)
        variables = model.init(jax.random.PRNGKey(0))
        variables, report = convert_tacotron2_state_dict(sd, variables)
        extra = {"imported_from": args.torch_checkpoint}

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
        r=int(meta.get("r", cfg.model.r)), extra=extra)
    print(f"wrote {args.out_path}")


if __name__ == "__main__":
    main()
