"""Core layers: Dense, Embedding, Conv1d, BatchNorm1d, Dropout.

Initialization parity with the reference's wrappers (layers/common_layers.py
`Linear`/`LinearBN` use xavier-uniform with nonlinearity gain; torch conv/
embedding defaults elsewhere). All activations are [B, ..., C] channel-last —
the TPU-friendly layout (C maps to lanes).
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

Params = dict[str, Any]

_GAINS = {"linear": 1.0, "relu": math.sqrt(2.0), "tanh": 5.0 / 3.0, "sigmoid": 1.0}


def _host_rng(key) -> np.random.Generator:
    """Deterministic numpy RNG from a JAX PRNG key. Weight init runs on HOST
    numpy: each distinct shape drawn with jax.random compiles its own tiny
    threefry executable (XLA:CPU compiles are ~0.5-2s each — a fresh model
    init paid ~44s of compile for zero value). Init needs determinism, not
    device execution."""
    return np.random.default_rng(np.asarray(jax.random.key_data(key),
                                            np.uint32))


def xavier_uniform(key, shape, gain: float = 1.0, dtype=jnp.float32):
    fan_in, fan_out = shape[0], shape[1]
    if len(shape) == 3:  # conv [width, in, out]
        rf = shape[0]
        fan_in, fan_out = shape[1] * rf, shape[2] * rf
    a = gain * math.sqrt(6.0 / (fan_in + fan_out))
    return jnp.asarray(_host_rng(key).uniform(-a, a, shape), dtype)


def cast_f32_to_bf16(tree):
    """Mixed-precision helper: cast every f32 leaf to bf16, leave the rest
    (int tables, counters) untouched. ONE definition shared by all trainers
    so the casting rule cannot drift between them."""
    return jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        tree)


class Dense:
    """y = x @ W + b, xavier-uniform init (reference common_layers.Linear)."""

    def __init__(self, in_dim: int, out_dim: int, use_bias: bool = True,
                 init_gain: str = "linear"):
        self.in_dim, self.out_dim, self.use_bias = in_dim, out_dim, use_bias
        self.gain = _GAINS[init_gain]

    def init(self, key) -> Params:
        p = {"w": xavier_uniform(key, (self.in_dim, self.out_dim), self.gain)}
        if self.use_bias:
            p["b"] = jnp.zeros((self.out_dim,))
        return p

    def __call__(self, p: Params, x):
        y = jnp.dot(x, p["w"])
        return y + p["b"] if self.use_bias else y


class Embedding:
    """Symbol/speaker lookup table. Reference inits TTS char embedding to
    uniform(-0.3, 0.3)-ish (std 0.3); we use normal(0, 0.3) matching scale."""

    def __init__(self, num: int, dim: int, init_std: float = 0.3):
        self.num, self.dim, self.init_std = num, dim, init_std

    def init(self, key) -> Params:
        table = _host_rng(key).standard_normal((self.num, self.dim)) * self.init_std
        return {"table": jnp.asarray(table, jnp.float32)}

    def __call__(self, p: Params, ids):
        return jnp.take(p["table"], ids, axis=0)


class Conv1d:
    """Channel-last 1D convolution [B, T, C_in] -> [B, T', C_out].

    'same' padding keeps T (stride 1); explicit padding counts supported.
    Weight layout [width, in, out] (XLA WIO for NWC).
    """

    def __init__(self, in_dim: int, out_dim: int, kernel_size: int,
                 stride: int = 1, padding: str | int = "same",
                 use_bias: bool = True, init_gain: str = "relu",
                 dilation: int = 1, pad_mode: str = "zeros",
                 groups: int = 1):
        self.in_dim, self.out_dim, self.k = in_dim, out_dim, kernel_size
        self.stride, self.dilation = stride, dilation
        self.use_bias = use_bias
        assert in_dim % groups == 0 and out_dim % groups == 0, (in_dim,
                                                                out_dim,
                                                                groups)
        self.groups = groups
        self.gain = _GAINS[init_gain]
        # pad_mode="reflect" mirrors the input instead of zero-filling
        # (torch ReflectionPad1d + valid conv — the MelGAN family's choice)
        self.pad_mode = pad_mode
        if padding == "same":
            total = dilation * (kernel_size - 1)
            self.pad = (total // 2, total - total // 2)
        elif padding == "valid":
            self.pad = (0, 0)
        elif isinstance(padding, int):
            self.pad = (padding, padding)
        else:
            self.pad = tuple(padding)

    def init(self, key) -> Params:
        p = {"w": xavier_uniform(
            key, (self.k, self.in_dim // self.groups, self.out_dim),
            self.gain)}
        if self.use_bias:
            p["b"] = jnp.zeros((self.out_dim,))
        return p

    def __call__(self, p: Params, x):
        pad = [self.pad]
        if self.pad_mode == "reflect" and self.pad != (0, 0):
            x = jnp.pad(x, ((0, 0), self.pad, (0, 0)), mode="reflect")
            pad = [(0, 0)]
        y = lax.conv_general_dilated(
            x, p["w"], window_strides=(self.stride,), padding=pad,
            rhs_dilation=(self.dilation,),
            dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=self.groups,
        )
        return y + p["b"] if self.use_bias else y


class ConvTranspose1d:
    """Channel-last transposed 1D conv: [B, T, C_in] -> [B, T*stride, C_out].

    Exactly torch's ConvTranspose1d with the MelGAN upsampler contract
    (padding = stride//2 + stride%2, output_padding = stride%2): expressed as
    an input-dilated regular conv (lhs_dilation = stride). Verified
    elementwise against torch for even and odd strides
    (tests/test_torch_import.py). Torch's [in, out, k] weight maps to our
    [k, in, out] with the kernel axis flipped."""

    def __init__(self, in_dim: int, out_dim: int, kernel_size: int, stride: int,
                 use_bias: bool = True, init_gain: str = "linear"):
        self.in_dim, self.out_dim, self.k, self.stride = in_dim, out_dim, kernel_size, stride
        self.use_bias = use_bias
        self.gain = _GAINS[init_gain]

    def init(self, key) -> Params:
        p = {"w": xavier_uniform(key, (self.k, self.in_dim, self.out_dim), self.gain)}
        if self.use_bias:
            p["b"] = jnp.zeros((self.out_dim,))
        return p

    def __call__(self, p: Params, x):
        u = self.stride
        p0 = u // 2 + u % 2
        pl = self.k - 1 - p0
        y = lax.conv_general_dilated(
            x, p["w"], window_strides=(1,), padding=[(pl, pl + u % 2)],
            lhs_dilation=(u,), dimension_numbers=("NWC", "WIO", "NWC"))
        return y + p["b"] if self.use_bias else y


class BatchNorm1d:
    """BatchNorm over all axes but the last (channels).

    Returns (y, new_state); state carries running mean/var (momentum 0.1,
    eps 1e-5 — torch defaults the reference relies on).
    """

    def __init__(self, dim: int, momentum: float = 0.1, eps: float = 1e-5):
        self.dim, self.momentum, self.eps = dim, momentum, eps

    def init(self, key=None) -> Params:
        return {"scale": jnp.ones((self.dim,)), "bias": jnp.zeros((self.dim,))}

    def init_state(self) -> Params:
        return {"mean": jnp.zeros((self.dim,)), "var": jnp.ones((self.dim,))}

    def __call__(self, p: Params, state: Params, x, train: bool,
                 mask=None):
        """mask: optional [B, T] validity mask; masked positions are excluded
        from batch statistics (the reference's BN sees padded frames — we do
        better and keep stats clean)."""
        if train:
            # statistics always in f32: bf16 reductions over B*T elements are
            # too coarse, and the running stats must accumulate in f32 even
            # when mixed-precision training feeds bf16 activations
            xs = x.astype(jnp.float32)
            if mask is not None:
                m = mask[..., None].astype(jnp.float32)
                cnt = jnp.maximum(m.sum(), 1.0)
                mean = (xs * m).sum(axis=tuple(range(x.ndim - 1))) / cnt
                var = (((xs - mean) ** 2) * m).sum(axis=tuple(range(x.ndim - 1))) / cnt
            else:
                axes = tuple(range(x.ndim - 1))
                mean = xs.mean(axis=axes)
                var = xs.var(axis=axes)
            new_state = {
                "mean": (1 - self.momentum) * state["mean"] + self.momentum * mean,
                "var": (1 - self.momentum) * state["var"] + self.momentum * var,
            }
        else:
            mean, var = state["mean"], state["var"]
            new_state = state
        # normalize in the activation dtype (keeps bf16 activations bf16)
        mean = mean.astype(x.dtype)
        var = var.astype(x.dtype)
        y = (x - mean) * lax.rsqrt(var + self.eps) * p["scale"] + p["bias"]
        return y, new_state


class LayerNorm:
    """Per-position LayerNorm over the channel axis.

    Stateless — unlike BatchNorm there are no running statistics, so
    train/eval behavior is identical. This matters for variable-length
    sequence models batched in length-sorted buckets: per-bucket batch
    statistics differ SYSTEMATICALLY with length, so BatchNorm's running
    average matches none of them and eval outputs collapse (measured on the
    ParallelTTS duration predictor — the reason the FastSpeech family
    normalizes with LayerNorm)."""

    def __init__(self, dim: int, eps: float = 1e-5):
        self.dim, self.eps = dim, eps

    def init(self, key=None) -> Params:
        return {"scale": jnp.ones((self.dim,)), "bias": jnp.zeros((self.dim,))}

    def __call__(self, p: Params, x):
        mean = x.mean(axis=-1, keepdims=True)
        var = ((x - mean) ** 2).mean(axis=-1, keepdims=True)
        return (x - mean) * lax.rsqrt(var + self.eps) * p["scale"] + p["bias"]


class Dropout:
    def __init__(self, rate: float):
        self.rate = rate

    def __call__(self, key, x, train: bool):
        if not train or self.rate == 0.0 or key is None:
            return x
        keep = 1.0 - self.rate
        mask = jax.random.bernoulli(key, keep, x.shape)
        return jnp.where(mask, x / keep, 0.0)


def tree_cast_floats(tree, dtype):
    """Cast every floating-point leaf of a pytree to `dtype` (ints/bools are
    left alone). Used by the bf16 inference path: params/state cast once, the
    MXU runs every matmul in bf16, outputs cast back to f32 at the boundary.

    Leaves come back as jnp arrays even when the input tree holds numpy
    arrays (e.g. straight from load_checkpoint): a numpy ml_dtypes-bf16
    leaf flowing into expressions like ``var + 1e-5`` is promoted by
    NUMPY's rules (bf16 + float -> f32) before jax ever sees it, silently
    upcasting the whole downstream graph and then failing the first
    strict-dtype primitive (conv) with a mixed f32/bf16 error — measured
    on the bf16 inference route with checkpoint-loaded BatchNorm state."""
    def cast(a):
        if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating):
            return jnp.asarray(a, dtype)
        return a

    return jax.tree_util.tree_map(cast, tree)


def prenet_dropout(key, x, rate: float = 0.5, enabled: bool = True):
    """Prenet dropout is ALWAYS on, train and inference alike — a deliberate
    reference quirk (Tacotron2 paper SS2.2; reference common_layers.Prenet)."""
    if not enabled or key is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)
