"""Minimal functional NN core.

The reference builds on torch.nn (SURVEY.md SS1 L2); this framework uses
explicit pytree parameters + pure apply functions instead — the idiomatic JAX
shape for `lax.scan` recurrences, `jax.grad`, and pjit/shard_map partitioning.
Modules are tiny config objects: `m.init(key) -> params`, `m(params, x) -> y`.
Stateful layers (BatchNorm) split params (learned) from state (running stats).
"""

from .core import Dense, Embedding, Conv1d, BatchNorm1d, Dropout, prenet_dropout  # noqa: F401
from .rnn import LSTMCell, GRUCell, lstm, bilstm, gru  # noqa: F401
