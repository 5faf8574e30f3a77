"""Model zoo: Tacotron2 / Tacotron TTS, speaker encoder, vocoders."""

from .factory import setup_model  # noqa: F401
