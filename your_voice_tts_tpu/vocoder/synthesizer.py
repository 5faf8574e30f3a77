"""Vocoder inference facade: normalized mel [n_mels, T] -> waveform.

Wired into the TTS Synthesizer by load_vocoder (reference
server/synthesizer.py loads WaveRNN/MelGAN checkpoints the same way).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..train.checkpoint import load_checkpoint
from .config import VocoderConfig, load_vocoder_config
from .models.melgan import MelganGenerator
from .models.wavernn import WaveRNN


def _restore_generator_subtree(checkpoint: str, template):
    """Restore only the 'g' generator subtree of a GAN checkpoint."""
    from ..train.checkpoint import _unflatten_like

    with np.load(checkpoint) as z:
        blobs = {k: z[k] for k in z.files if k.startswith("params::")}
    gsec = {k[len("params::"):]: v for k, v in blobs.items()}
    gsub = {k[len("['g']"):]: v for k, v in gsec.items() if k.startswith("['g']")}
    return _unflatten_like(template, gsub, strict=True)


class VocoderSynthesizer:
    def __init__(self, config: str | VocoderConfig, checkpoint: str | None = None,
                 tts_audio_cfg=None, rng_seed: int = 0):
        self.cfg = load_vocoder_config(config)
        if tts_audio_cfg is not None and \
                tts_audio_cfg.num_mels != self.cfg.audio.num_mels:
            raise ValueError("TTS and vocoder num_mels mismatch")
        self._rng = jax.random.PRNGKey(rng_seed)
        if self.cfg.model == "pwgan":
            from .models.pwgan import ParallelWaveganGenerator

            m = self.cfg.pwgan
            self.model = ParallelWaveganGenerator(
                self.cfg.audio.num_mels, m.num_layers, m.stacks,
                m.residual_channels, m.gate_channels, m.skip_channels,
                m.kernel_size, m.upsample_factors,
                aux_context_window=m.aux_context_window)
            self.params = self.model.init(jax.random.PRNGKey(0))
            if checkpoint:
                self.params = _restore_generator_subtree(checkpoint, self.params)
            self._fn = jax.jit(lambda p, mel, key: self.model(p, mel, key=key))
        elif self.cfg.model == "melgan":
            m = self.cfg.melgan
            self.model = MelganGenerator(
                self.cfg.audio.num_mels, m.upsample_factors, m.base_channels,
                m.num_res_blocks, m.kernel_size)
            self.params = self.model.init(jax.random.PRNGKey(0))
            if checkpoint:
                self.params = _restore_generator_subtree(checkpoint, self.params)
            self._fn = jax.jit(lambda p, mel: self.model(p, mel))
        elif self.cfg.model == "wavernn":
            w = self.cfg.wavernn
            self.model = WaveRNN(self.cfg.audio.num_mels, w.bits, w.rnn_dims,
                                 w.fc_dims, w.compute_dims, w.res_out_dims,
                                 w.num_res_blocks, w.pad, w.upsample_factors,
                                 w.mode, num_mixtures=w.num_mixtures)
            self.params = self.model.init(jax.random.PRNGKey(0))
            if checkpoint:
                self.params, _, _, _ = load_checkpoint(
                    checkpoint, params=self.params, model_state={}, opt_state=None)
            self._fn = jax.jit(
                lambda p, mel, key: self.model.generate(
                    p, mel, key, batched=w.batched, target=w.target,
                    overlap=w.overlap))
        else:
            raise ValueError(f"unknown vocoder model {self.cfg.model!r}")

    def mel_to_wav(self, mel: np.ndarray) -> np.ndarray:
        """mel [n_mels, T] (TTS layout) -> waveform float32 [T*hop]."""
        mel_t = jnp.asarray(np.asarray(mel, np.float32).T)[None]  # [1, T, n_mels]
        if self.cfg.model == "melgan":
            wav = self._fn(self.params, mel_t)[0]
        elif self.cfg.model == "pwgan":
            self._rng, sub = jax.random.split(self._rng)
            wav = self._fn(self.params, mel_t, sub)[0]
        else:
            w = self.cfg.wavernn
            # WaveRNN conditioning needs `pad` context frames on each side
            pad = w.pad
            mel_p = jnp.pad(mel_t[0], ((pad, pad), (0, 0)), mode="edge")
            self._rng, sub = jax.random.split(self._rng)
            wav = self._fn(self.params, mel_p, sub)
        return np.asarray(wav, np.float32)
