"""Multi-host training launcher (the reference's distribute.py analogue).

The reference spawns one process per GPU and wires NCCL by hand (SURVEY.md
SS3.2). On TPU, SINGLE-HOST multi-chip needs no launcher at all — the jitted
train step is SPMD over every local device already (parallel/mesh.py), so
`bin.train` is the whole story on one host.

This entry exists for MULTI-HOST pods: each host runs the same command; we
initialize the JAX distributed runtime (coordinator discovery), shard the
dataset by process index (the DistributedSampler analogue), and gate
checkpoint/log IO on process 0 — then hand off to the normal trainer.

python -m your_voice_tts_tpu.bin.distribute --config_path config.json \
    [--coordinator_address host:port --num_processes N --process_id K]
"""

from __future__ import annotations

import argparse


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(description="Multi-host TPU training launcher")
    p.add_argument("--config_path", required=True)
    p.add_argument("--coordinator_address", default=None,
                   help="host:port of process 0 (auto-detected on TPU pods)")
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    p.add_argument("--restore_path", default=None)
    p.add_argument("--max_steps", type=int, default=None)
    args, rest = p.parse_known_args(argv)

    import jax

    # On Cloud TPU pods jax.distributed.initialize() autodetects everything;
    # explicit flags cover manual clusters.
    kwargs = {}
    if args.coordinator_address:
        kwargs = dict(coordinator_address=args.coordinator_address,
                      num_processes=args.num_processes,
                      process_id=args.process_id)
    jax.distributed.initialize(**kwargs)
    print(f" > process {jax.process_index()}/{jax.process_count()} up, "
          f"{jax.local_device_count()} local / {jax.device_count()} global devices")

    from .train import main as train_main

    train_argv = ["--config_path", args.config_path]
    if args.restore_path:
        train_argv += ["--restore_path", args.restore_path]
    if args.max_steps:
        train_argv += ["--max_steps", str(args.max_steps)]
    train_main(train_argv + rest)


if __name__ == "__main__":
    main()
