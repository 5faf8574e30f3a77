"""your_voice_tts_tpu — a TPU-native (JAX/XLA/Pallas/pjit) voice-cloning TTS framework.

A ground-up rebuild of the capability surface of ``prototypefund/your-voice-TTS``
(a Mozilla-TTS-derived Tacotron2 + vocoder + speaker-encoder stack; see
SURVEY.md for the component inventory), redesigned TPU-first:

- DSP (``ops/``): STFT/mel/Griffin-Lim as fused XLA/Pallas programs, not librosa.
- Models (``models/``): Tacotron2/Tacotron with the autoregressive decoder as a
  single ``lax.scan`` (the reference's per-step Python loop, compiled once).
- Parallelism (``parallel/``): data-parallel over a ``jax.sharding.Mesh`` with
  ``shard_map`` + ``psum`` riding ICI (the reference's NCCL all-reduce).
- Static shapes everywhere: length-bucketed batching + masking instead of
  dynamic padding, so every hot path hits one compiled XLA program.

Reference parity map: SURVEY.md SS1-SS2 (layer map / component inventory).
"""

__version__ = "0.1.0"
