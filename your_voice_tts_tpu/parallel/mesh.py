"""Device mesh + sharding (the reference's distribute.py, rebuilt for TPU).

The reference's only parallelism is single-node data parallelism: one process
per GPU, NCCL all-reduce on gradients, DistributedSampler (SURVEY.md SS2.3).
The TPU-native equivalent is SPMD over a 1-axis `jax.sharding.Mesh`:

- the batch is sharded over the "data" axis (NamedSharding), parameters and
  optimizer state are replicated;
- the train step is `jax.jit`-compiled once; XLA's SPMD partitioner inserts
  the gradient all-reduce as ICI collectives automatically — there is no
  hand-written communication (and DCN is used across slices transparently);
- dataset sharding-by-rank becomes per-process batch slicing via
  `jax.process_index()` in multi-host runs (single-host here: the full batch
  is simply laid out across local devices).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    return Mesh(np.asarray(devices[:n]).reshape(n), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(axis))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh, axis: str = "data") -> dict:
    """Lay a host batch out across the mesh (batch dim sharded, scalars
    replicated). Batch size must divide the mesh size.

    Multi-host: each process passes its LOCAL slice of the global batch
    (global batch = concat over process_index order — the reference's
    DistributedSampler analogue) and the arrays are assembled into global
    jax.Arrays without any cross-host data movement."""
    data = batch_sharding(mesh, axis)
    rep = replicate(mesh)
    multihost = jax.process_count() > 1
    out = {}
    for k, v in batch.items():
        v = np.asarray(v)
        if v.ndim == 0:
            out[k] = jax.device_put(v, rep)
        elif multihost:
            global_shape = (v.shape[0] * jax.process_count(),) + v.shape[1:]
            out[k] = jax.make_array_from_process_local_data(data, v, global_shape)
        else:
            out[k] = jax.device_put(v, data)
    return out


def sync_batch_shapes(batch: dict, r: int) -> dict:
    """Multi-host SPMD requires every process to compile and run the SAME
    program each step, so per-process bucket shapes (text/mel pad lengths,
    derived from local batch maxima) must be reconciled to the global max
    before `shard_batch` assembles the global arrays. One tiny
    process_allgather of the two ints per batch; single-process is a no-op."""
    if jax.process_count() <= 1:
        return batch
    from jax.experimental import multihost_utils

    t_text = batch["text"].shape[1]
    t_mel = batch["mel"].shape[1]
    dims = multihost_utils.process_allgather(np.array([t_text, t_mel], np.int32))
    g_text, g_mel = int(dims[:, 0].max()), int(dims[:, 1].max())
    if g_text == t_text and g_mel == t_mel:
        return batch
    out = dict(batch)
    out["text"] = np.pad(batch["text"], ((0, 0), (0, g_text - t_text)))
    out["mel"] = np.pad(batch["mel"],
                        ((0, 0), (0, g_mel - t_mel), (0, 0)))
    if "linear" in batch:
        out["linear"] = np.pad(batch["linear"],
                               ((0, 0), (0, g_mel - t_mel), (0, 0)))
    # stop target padding keeps the terminal 1s: pad frames past the end stay 1
    st = batch["stop_targets"]
    out["stop_targets"] = np.pad(st, ((0, 0), (0, g_mel // r - st.shape[1])),
                                 constant_values=1.0)
    return out


def pad_batch_to_devices(batch: dict, n_devices: int) -> dict:
    """Pad the batch dim up to a multiple of the mesh size (phantom rows carry
    mel_len=0 so losses ignore them — see data/dataset.py)."""
    b = next(v.shape[0] for v in batch.values() if getattr(v, "ndim", 0) > 0)
    rem = (-b) % n_devices
    if rem == 0:
        return batch
    out = {}
    for k, v in batch.items():
        v = np.asarray(v)
        if v.ndim == 0:
            out[k] = v
        else:
            pad = [(0, rem)] + [(0, 0)] * (v.ndim - 1)
            out[k] = np.pad(v, pad)
    if "text_lengths" in out:
        out["text_lengths"][b:] = 1  # attention needs >=1 valid position
    return out
