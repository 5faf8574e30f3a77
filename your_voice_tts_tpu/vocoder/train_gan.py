"""MelGAN trainer (reference vocoder/train.py GAN loop).

Generator warm-up on multi-res STFT loss alone, then alternating LSGAN
updates with feature matching — each side one jitted step.

Data parallel like the TTS trainer (reference DP wraps ALL training,
SURVEY.md SS2.3): params/opt replicated over the 1-axis mesh, the
(mel, audio) batch sharded on the data axis, XLA inserts the gradient
all-reduce over ICI.
"""

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


def _f32_tree(t):
    """Cast every float leaf up to f32 (loss side of mixed precision)."""
    return jax.tree_util.tree_map(
        lambda a: a.astype(jnp.float32)
        if hasattr(a, "dtype") and a.dtype == jnp.bfloat16 else a, t)
from ..train.checkpoint import load_checkpoint, save_checkpoint
from .config import VocoderConfig
from .dataset import GANDataset
from .losses import (
    disc_adv_loss, feature_match_loss, gen_adv_loss, multi_scale_stft_loss,
)
from .models.melgan import MelganGenerator, MelganMultiscaleDiscriminator


class _SingleScale:
    """Adapter: a single discriminator presented as a 1-scale list."""

    def __init__(self, disc):
        self.disc = disc

    def init(self, key):
        return self.disc.init(key)

    def __call__(self, p, x):
        return [self.disc(p, x)]


class GANTrainState(NamedTuple):
    g_params: Any
    d_params: Any
    g_opt: Any
    d_opt: Any
    step: jnp.ndarray


class GANTrainer:
    def __init__(self, cfg: VocoderConfig, items: list, output_path: str | None = None,
                 verbose: bool = True):
        self.cfg = cfg
        self.ap = AudioProcessor(cfg.audio)
        hop = self.ap.hop_length
        if cfg.model == "pwgan":
            from .models.pwgan import (
                ParallelWaveganDiscriminator, ParallelWaveganGenerator,
            )

            ups = cfg.pwgan.upsample_factors
            prod = 1
            for u in ups:
                prod *= u
            assert prod == hop, f"pwgan upsample product {prod} != hop {hop}"
            self.generator = ParallelWaveganGenerator(
                cfg.audio.num_mels, cfg.pwgan.num_layers, cfg.pwgan.stacks,
                cfg.pwgan.residual_channels, cfg.pwgan.gate_channels,
                cfg.pwgan.skip_channels, cfg.pwgan.kernel_size, ups,
                aux_context_window=cfg.pwgan.aux_context_window)
            pw_disc = ParallelWaveganDiscriminator(cfg.pwgan.disc_layers,
                                                   cfg.pwgan.disc_channels)
            # uniform interface: a list of (score, feats) scales
            self.discriminator = _SingleScale(pw_disc)
            self._gen_needs_key = True
        else:
            prod = 1
            for u in cfg.melgan.upsample_factors:
                prod *= u
            assert prod == hop, (
                f"melgan upsample_factors product {prod} != hop_length {hop}")
            self.generator = MelganGenerator(
                cfg.audio.num_mels, cfg.melgan.upsample_factors,
                cfg.melgan.base_channels, cfg.melgan.num_res_blocks,
                cfg.melgan.kernel_size)
            self.discriminator = MelganMultiscaleDiscriminator(
                cfg.melgan.num_scales, cfg.melgan.disc_base_channels)
            self._gen_needs_key = False
        self.dataset = GANDataset(items, self.ap, cfg.training.seq_len)
        self.g_optimizer = optax.chain(
            optax.clip_by_global_norm(cfg.training.grad_clip),
            optax.adam(cfg.training.lr_gen, b1=0.5, b2=0.9))
        self.d_optimizer = optax.chain(
            optax.clip_by_global_norm(cfg.training.grad_clip),
            optax.adam(cfg.training.lr_disc, b1=0.5, b2=0.9))
        # GAN losses are unmasked means, so phantom padding rows would skew
        # them — instead the GLOBAL batch rounds UP to a multiple of the
        # device count and the mesh spans every device (a gcd-trimmed mesh
        # leaves the other processes' devices unaddressable multi-host)
        self.mesh = make_mesh()
        self.n_devices = self.mesh.devices.size
        self.global_batch = -(-cfg.training.batch_size //
                              self.n_devices) * self.n_devices
        rep = replicate(self.mesh)
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        g_params = jax.device_put(self.generator.init(k1), rep)
        d_params = jax.device_put(self.discriminator.init(k2), rep)
        self.state = GANTrainState(
            g_params, d_params,
            jax.device_put(self.g_optimizer.init(g_params), rep),
            jax.device_put(self.d_optimizer.init(d_params), rep),
            jnp.zeros((), jnp.int32))
        self.output_path = output_path
        self.verbose = verbose
        self._g_step = None
        self._d_step = None

    # --- steps ---------------------------------------------------------------


    def _build_steps(self, use_disc: bool):
        cfg = self.cfg.training
        mp = cfg.gan_mixed_precision

        from ..nn.core import cast_f32_to_bf16 as cast_down

        def g_loss_fn(g_params, d_params, mel, audio, key):
            # mixed precision: conv forwards (generator + discriminator) in
            # bf16 against f32 master weights; the LSGAN/multi-res-STFT/
            # feature-matching losses always evaluate in f32 (waveforms and
            # disc features are cast back up)
            if mp:
                g_params, d_params = cast_down(g_params), cast_down(d_params)
                mel = mel.astype(jnp.bfloat16)
            if self._gen_needs_key:
                fake = self.generator(g_params, mel, key=key)
            else:
                fake = self.generator(g_params, mel)
            fake = fake.astype(jnp.float32)
            loss = 0.0
            parts = {}
            if cfg.use_stft_loss:
                sl = multi_scale_stft_loss(fake, audio)
                loss = loss + cfg.stft_loss_weight * sl
                parts["stft_loss"] = sl
            if use_disc:
                d_in = fake.astype(jnp.bfloat16) if mp else fake
                a_in = audio.astype(jnp.bfloat16) if mp else audio
                fake_out = _f32_tree(self.discriminator(d_params, d_in))
                real_out = _f32_tree(self.discriminator(d_params, a_in))
                adv = gen_adv_loss([s for s, _ in fake_out])
                loss = loss + adv
                parts["gen_adv_loss"] = adv
                if cfg.use_feat_match_loss:
                    fm = feature_match_loss([f for _, f in fake_out],
                                            [f for _, f in real_out])
                    loss = loss + cfg.feat_match_loss_weight * fm
                    parts["feat_match_loss"] = fm
            parts["gen_loss"] = loss
            return loss, parts

        @jax.jit
        def g_step(state: GANTrainState, mel, audio, key):
            (loss, parts), grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
                state.g_params, state.d_params, mel, audio, key)
            updates, g_opt = self.g_optimizer.update(grads, state.g_opt,
                                                     state.g_params)
            g_params = optax.apply_updates(state.g_params, updates)
            return state._replace(g_params=g_params, g_opt=g_opt,
                                  step=state.step + 1), parts

        def d_loss_fn(d_params, g_params, mel, audio, key):
            if mp:
                g_params, d_params = cast_down(g_params), cast_down(d_params)
                mel = mel.astype(jnp.bfloat16)
                audio_in = audio.astype(jnp.bfloat16)
            else:
                audio_in = audio
            if self._gen_needs_key:
                fake = self.generator(g_params, mel, key=key)
            else:
                fake = self.generator(g_params, mel)
            fake = jax.lax.stop_gradient(fake)
            if mp:
                fake = fake.astype(jnp.bfloat16)
            fake_out = _f32_tree(self.discriminator(d_params, fake))
            real_out = _f32_tree(self.discriminator(d_params, audio_in))
            loss = disc_adv_loss([s for s, _ in real_out], [s for s, _ in fake_out])
            return loss, {"disc_loss": loss}

        @jax.jit
        def d_step(state: GANTrainState, mel, audio, key):
            (loss, parts), grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
                state.d_params, state.g_params, mel, audio, key)
            updates, d_opt = self.d_optimizer.update(grads, state.d_opt,
                                                     state.d_params)
            d_params = optax.apply_updates(state.d_params, updates)
            return state._replace(d_params=d_params, d_opt=d_opt), parts

        return g_step, d_step

    def fit(self, max_steps: int) -> dict:
        cfg = self.cfg.training
        # per-process seed: in a multi-host run every process must sample
        # DIFFERENT clips (shard_batch assembles the global batch from the
        # local slices — identical seeds would train on duplicates)
        rng = np.random.default_rng(1 + jax.process_index())
        local_batch = self.global_batch // jax.process_count()
        last: dict = {}
        steps_built_with_disc = None
        for _ in range(max_steps):
            step = int(self.state.step)
            use_disc = step >= cfg.steps_to_start_discriminator
            if steps_built_with_disc != use_disc:
                self._g_step, self._d_step = self._build_steps(use_disc)
                steps_built_with_disc = use_disc
            mel, audio = self.dataset.sample_batch(local_batch, rng)
            sharded = shard_batch({"mel": mel, "audio": audio}, self.mesh)
            mel_s, audio_s = sharded["mel"], sharded["audio"]
            # independent draws: the discriminator must not score the exact
            # generator noise just used for the generator update
            k_g, k_d = jax.random.split(
                jax.random.PRNGKey(int(rng.integers(2 ** 31))))
            t0 = time.time()
            self.state, parts = self._g_step(self.state, mel_s, audio_s, k_g)
            if use_disc:
                self.state, d_parts = self._d_step(self.state, mel_s, audio_s,
                                                   k_d)
                parts = {**parts, **d_parts}
            # one host transfer for all metrics (see train/trainer.py note)
            last = {k: float(v) for k, v in jax.device_get(parts).items()}
            last["step_time"] = time.time() - t0
            if self.verbose and (step + 1) % cfg.print_step == 0:
                msg = " | ".join(f"{k}: {v:.4f}" for k, v in last.items())
                print(f"   --> GAN STEP {step + 1} | {msg}", flush=True)
            if self.output_path and (step + 1) % cfg.save_step == 0 \
                    and jax.process_index() == 0:  # rank-0 checkpointing
                self.save(os.path.join(self.output_path,
                                       f"vocoder_checkpoint_{step + 1}.npz"))
        return last

    # --- persistence ------------------------------------------------------

    def save(self, path: str) -> None:
        save_checkpoint(path, params={"g": self.state.g_params,
                                      "d": self.state.d_params},
                        model_state={}, opt_state={"g": self.state.g_opt,
                                                   "d": self.state.d_opt},
                        step=int(self.state.step), epoch=0, r=1,
                        extra={"vocoder_model": self.cfg.model})

    def restore(self, path: str) -> None:
        params, _, opt, meta = load_checkpoint(
            path, params={"g": self.state.g_params, "d": self.state.d_params},
            model_state={}, opt_state={"g": self.state.g_opt, "d": self.state.d_opt})
        self.state = GANTrainState(params["g"], params["d"], opt["g"], opt["d"],
                                   jnp.asarray(meta["step"], jnp.int32))
