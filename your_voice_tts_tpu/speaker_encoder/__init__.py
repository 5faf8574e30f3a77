"""Speaker encoder (reference speaker_encoder/ package; SURVEY.md SS2.1,
SS3.5): LSTM d-vector network + GE2E loss + embedding extraction — the
offline half of the 'your voice' cloning path."""

from .model import SpeakerEncoder  # noqa: F401
from .losses import ge2e_loss  # noqa: F401
