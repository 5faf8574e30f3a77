"""WaveRNN trainer (reference vocoder WaveRNN training loop): teacher-forced
NLL by I/O mode (mu-law cross-entropy / MoL / Gaussian), one jitted scan
step."""

from __future__ import annotations

import os
import time
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..audio import AudioProcessor
from ..parallel import make_mesh, replicate, shard_batch
from ..train.checkpoint import load_checkpoint, save_checkpoint
from .config import VocoderConfig
from .dataset import GANDataset
from .models.wavernn import WaveRNN


class WaveRNNTrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


class WaveRNNTrainer:
    def __init__(self, cfg: VocoderConfig, items: list,
                 output_path: str | None = None, verbose: bool = True):
        self.cfg = cfg
        self.ap = AudioProcessor(cfg.audio)
        w = cfg.wavernn
        prod = 1
        for u in w.upsample_factors:
            prod *= u
        assert prod == self.ap.hop_length, (
            f"wavernn upsample product {prod} != hop {self.ap.hop_length}")
        self.model = WaveRNN(cfg.audio.num_mels, w.bits, w.rnn_dims, w.fc_dims,
                             w.compute_dims, w.res_out_dims, w.num_res_blocks,
                             w.pad, w.upsample_factors, w.mode,
                             num_mixtures=w.num_mixtures)
        self.dataset = GANDataset(items, self.ap, cfg.training.seq_len, pad=w.pad)
        self.optimizer = optax.chain(
            optax.clip_by_global_norm(cfg.training.grad_clip),
            optax.adam(cfg.training.lr_gen))
        # DP like the TTS trainer: params/opt replicated, batch sharded on
        # the data axis, XLA inserts the gradient all-reduce (SURVEY.md SS2.3)
        # the NLL is an unmasked mean (no phantom-row padding) — the
        # GLOBAL batch rounds UP to a multiple of the device count and the
        # mesh spans every device (multi-host safe; see train_gan.py)
        self.mesh = make_mesh()
        self.n_devices = self.mesh.devices.size
        self.global_batch = -(-cfg.training.batch_size //
                              self.n_devices) * self.n_devices
        rep = replicate(self.mesh)
        params = jax.device_put(self.model.init(jax.random.PRNGKey(0)), rep)
        self.state = WaveRNNTrainState(
            params, jax.device_put(self.optimizer.init(params), rep),
            jnp.zeros((), jnp.int32))
        self.output_path = output_path
        self.verbose = verbose
        self._step_fn = self._build_step()

    def _build_step(self):
        mp = self.cfg.training.mixed_precision

        def loss_fn(params, mel, audio):
            # NLL by I/O mode: mu-law cross-entropy, discretized MoL, or
            # Gaussian (models/wavernn.py::WaveRNN.loss). mixed_precision:
            # bf16 forward against f32 master weights, NLL always f32.
            dtype = None
            if mp:
                from ..nn.core import cast_f32_to_bf16

                dtype = jnp.bfloat16
                params = cast_f32_to_bf16(params)
                mel = mel.astype(dtype)
            return self.model.loss(params, mel, audio, compute_dtype=dtype)

        @jax.jit
        def train_step(state: WaveRNNTrainState, mel, audio):
            loss, grads = jax.value_and_grad(loss_fn)(state.params, mel, audio)
            updates, opt_state = self.optimizer.update(grads, state.opt_state,
                                                       state.params)
            params = optax.apply_updates(state.params, updates)
            return WaveRNNTrainState(params, opt_state, state.step + 1), loss

        return train_step

    def fit(self, max_steps: int) -> dict:
        cfg = self.cfg.training
        # per-process seed + local batch slice (see train_gan.py fit)
        rng = np.random.default_rng(1 + jax.process_index())
        local_batch = self.global_batch // jax.process_count()
        last: dict = {}
        for _ in range(max_steps):
            mel, audio = self.dataset.sample_batch(local_batch, rng)
            sharded = shard_batch({"mel": mel, "audio": audio}, self.mesh)
            t0 = time.time()
            self.state, loss = self._step_fn(self.state, sharded["mel"],
                                             sharded["audio"])
            step = int(self.state.step)
            last = {"loss": float(loss), "step_time": time.time() - t0}
            if self.verbose and step % cfg.print_step == 0:
                print(f"   --> WAVERNN STEP {step} | loss: {last['loss']:.4f} "
                      f"| step_time: {last['step_time']:.3f}", flush=True)
            if self.output_path and step % cfg.save_step == 0 \
                    and jax.process_index() == 0:  # rank-0 checkpointing
                self.save(os.path.join(self.output_path,
                                       f"wavernn_checkpoint_{step}.npz"))
        return last

    def save(self, path: str) -> None:
        save_checkpoint(path, params=self.state.params, model_state={},
                        opt_state=self.state.opt_state, step=int(self.state.step),
                        epoch=0, r=1, extra={"vocoder_model": "wavernn"})

    def restore(self, path: str) -> None:
        params, _, opt, meta = load_checkpoint(
            path, params=self.state.params, model_state={},
            opt_state=self.state.opt_state)
        self.state = WaveRNNTrainState(params, opt,
                                       jnp.asarray(meta["step"], jnp.int32))
