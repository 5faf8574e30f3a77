"""Data pipeline: corpus formatters, bucketed dataset, synthetic fixtures."""

from .dataset import TTSDataset  # noqa: F401
from .formatters import get_formatter, load_meta_data  # noqa: F401
