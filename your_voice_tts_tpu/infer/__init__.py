"""Inference runtime: synthesis API, Synthesizer, HTTP server."""

from .synthesis import synthesis, synthesis_batch  # noqa: F401
from .synthesizer import Synthesizer  # noqa: F401
