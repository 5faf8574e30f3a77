"""Model factory (reference utils/generic_utils.py::setup_model)."""

from __future__ import annotations

from ..config import Config


def setup_model(num_chars: int, num_speakers: int, cfg: Config,
                speaker_embedding_dim: int = 0):
    """Build the model named by cfg.model.model, mirroring the reference
    factory's signature (num_chars, num_speakers, config)."""
    name = cfg.model.model
    # r_init: the largest r the gradual-training schedule will ever use,
    # so projection/stopnet params stay fixed across the schedule
    r_init = cfg.model.r
    if cfg.training.gradual_training:
        r_init = max(r_init, max(row[1] for row in cfg.training.gradual_training))
    if name == "Tacotron2":
        from .tacotron2 import Tacotron2

        return Tacotron2(
            num_chars=num_chars,
            cfg=cfg.model,
            n_mels=cfg.audio.num_mels,
            num_speakers=num_speakers,
            speaker_embedding_dim=speaker_embedding_dim,
            use_gst=cfg.speakers.use_gst,
            gst_cfg=cfg.speakers.gst,
            r_init=r_init,
        )
    if name == "Tacotron":
        from .tacotron import Tacotron

        return Tacotron(
            num_chars=num_chars,
            cfg=cfg.model,
            n_mels=cfg.audio.num_mels,
            num_freq=cfg.audio.num_freq,
            num_speakers=num_speakers,
            speaker_embedding_dim=speaker_embedding_dim,
            use_gst=cfg.speakers.use_gst,
            gst_cfg=cfg.speakers.gst,
            r_init=r_init,
        )
    if name == "ParallelTTS":
        from .parallel_tts import ParallelTTS

        return ParallelTTS(
            num_chars=num_chars,
            cfg=cfg.model,
            n_mels=cfg.audio.num_mels,
            num_speakers=num_speakers,
            speaker_embedding_dim=speaker_embedding_dim,
            use_gst=cfg.speakers.use_gst,
            gst_cfg=cfg.speakers.gst,
        )
    raise ValueError(f"unknown model {name!r}")
