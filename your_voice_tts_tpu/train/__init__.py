"""Training runtime: optimizer stack, checkpointing, Trainer loop."""

from .optim import build_optimizer, noam_schedule  # noqa: F401
from .checkpoint import save_checkpoint, load_checkpoint, restore_partial  # noqa: F401
from .trainer import Trainer, TrainState  # noqa: F401
