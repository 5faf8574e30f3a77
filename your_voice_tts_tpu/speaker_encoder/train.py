"""Speaker-encoder trainer (reference speaker_encoder/train.py): GE2E over
random N x M batches, one jitted step.

DP over the device mesh like every other trainer here (SURVEY.md SS2.3):
params/opt replicated, the N-speaker axis sharded on 'data'. The GE2E loss
couples the whole N x M batch through its similarity matrix, but the
expensive part — the LSTMP forward over mel windows — shards cleanly, and
XLA inserts the embedding all-gather ahead of the loss."""

from __future__ import annotations

import math
import os
import time
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..parallel import make_mesh, replicate, shard_batch
from ..train.checkpoint import load_checkpoint, save_checkpoint
from .losses import ge2e_loss, init_ge2e_params
from .model import SpeakerEncoder


class SETrainState(NamedTuple):
    params: Any
    loss_params: Any
    opt_state: Any
    step: jnp.ndarray


class SpeakerEncoderTrainer:
    def __init__(self, model: SpeakerEncoder, dataset, lr: float = 1e-4,
                 grad_clip: float = 3.0, num_speakers_per_batch: int = 4,
                 num_utters_per_speaker: int = 4, output_path: str | None = None,
                 verbose: bool = True):
        self.model = model
        self.dataset = dataset
        self.N = num_speakers_per_batch
        self.M = num_utters_per_speaker
        self.optimizer = optax.chain(optax.clip_by_global_norm(grad_clip),
                                     optax.adam(lr))
        params = model.init(jax.random.PRNGKey(0))
        loss_params = init_ge2e_params()
        self.state = SETrainState(
            params, loss_params,
            self.optimizer.init({"model": params, "loss": loss_params}),
            jnp.zeros((), jnp.int32))
        # shard over the largest device count that divides the speaker axis
        self.mesh = make_mesh(math.gcd(self.N, len(jax.devices())))
        self.state = jax.device_put(self.state, replicate(self.mesh))
        self.output_path = output_path
        self.verbose = verbose

        def loss_fn(all_params, mels):
            N, M = mels.shape[:2]
            flat = mels.reshape((N * M,) + mels.shape[2:])
            emb = self.model(all_params["model"], flat).reshape(N, M, -1)
            return ge2e_loss(emb, all_params["loss"]["w"], all_params["loss"]["b"])

        @jax.jit
        def train_step(state: SETrainState, mels):
            all_params = {"model": state.params, "loss": state.loss_params}
            loss, grads = jax.value_and_grad(loss_fn)(all_params, mels)
            updates, opt_state = self.optimizer.update(grads, state.opt_state,
                                                       all_params)
            new = optax.apply_updates(all_params, updates)
            return SETrainState(new["model"], new["loss"], opt_state,
                                state.step + 1), loss

        self._step_fn = train_step

    def fit(self, max_steps: int, print_step: int = 50) -> dict:
        rng = np.random.default_rng(0)
        last = {}
        for _ in range(max_steps):
            mels = self.dataset.sample_batch(self.N, self.M, rng)
            t0 = time.time()
            mels = shard_batch({"mels": np.asarray(mels)}, self.mesh)["mels"]
            self.state, loss = self._step_fn(self.state, mels)
            step = int(self.state.step)
            last = {"loss": float(loss), "step_time": time.time() - t0}
            if self.verbose and step % print_step == 0:
                print(f"   --> GE2E STEP {step} | loss: {last['loss']:.4f}",
                      flush=True)
            if self.output_path and step % 1000 == 0:
                self.save(os.path.join(self.output_path,
                                       f"speaker_encoder_{step}.npz"))
        return last

    def save(self, path: str) -> None:
        save_checkpoint(path, params=self.state.params,
                        model_state={"ge2e": self.state.loss_params},
                        opt_state=self.state.opt_state,
                        step=int(self.state.step), epoch=0, r=1,
                        extra={"model": "speaker_encoder"})

    def restore(self, path: str) -> None:
        params, mstate, opt, meta = load_checkpoint(
            path, params=self.state.params,
            model_state={"ge2e": self.state.loss_params},
            opt_state=self.state.opt_state)
        self.state = SETrainState(params, mstate["ge2e"], opt,
                                  jnp.asarray(meta["step"], jnp.int32))
