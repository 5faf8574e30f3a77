"""CPU oracle package.

An independent numpy reimplementation of the reference's exact DSP semantics
(mozilla/TTS-era ``utils/audio.py::AudioProcessor``, librosa conventions).
The TPU framework's parity tests compare against THIS code, which is itself
cross-validated against torch.stft in tests. Deliberately shares no code with
``your_voice_tts_tpu`` so a bug can't hide in a shared helper.
"""

from .audio_ref import AudioProcessorRef  # noqa: F401
