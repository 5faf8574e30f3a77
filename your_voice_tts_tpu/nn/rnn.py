"""Recurrent cells and scan drivers.

The reference uses torch LSTM/GRU (cuDNN kernels) for the Tacotron encoder
BiLSTM, decoder LSTMCells, CBHG GRU, speaker-encoder LSTM stack, and WaveRNN
GRU (SURVEY.md SS2.1). Here each cell is a fused pair of matmuls + gate math,
and sequences run under `lax.scan` so XLA compiles ONE loop body (the
reference's Python per-step loops disappear). Gate order and init match torch
conventions (i,f,g,o for LSTM; r,z,n for GRU; uniform(-1/sqrt(h), 1/sqrt(h)))
so behavior is comparable layer-for-layer.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
from jax import lax

Params = dict[str, Any]


def _uniform(key, shape, scale):
    # host-numpy init: see nn/core.py::_host_rng (avoids per-shape threefry
    # compiles at model init)
    from .core import _host_rng

    return jnp.asarray(_host_rng(key).uniform(-scale, scale, shape), jnp.float32)


class LSTMCell:
    """Fused LSTM cell; gates ordered (i, f, g, o) like torch."""

    def __init__(self, in_dim: int, hidden: int):
        self.in_dim, self.hidden = in_dim, hidden

    def init(self, key) -> Params:
        k1, k2, k3 = jax.random.split(key, 3)
        s = 1.0 / math.sqrt(self.hidden)
        return {
            "wx": _uniform(k1, (self.in_dim, 4 * self.hidden), s),
            "wh": _uniform(k2, (self.hidden, 4 * self.hidden), s),
            "b": _uniform(k3, (4 * self.hidden,), s),
        }

    def initial_state(self, batch: int, dtype=jnp.float32):
        z = jnp.zeros((batch, self.hidden), dtype)
        return (z, z)

    def __call__(self, p: Params, state, x):
        h, c = state
        gates = jnp.dot(x, p["wx"]) + jnp.dot(h, p["wh"]) + p["b"]
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return (h, c), h


class GRUCell:
    """Fused GRU cell; gates ordered (r, z, n) like torch."""

    def __init__(self, in_dim: int, hidden: int):
        self.in_dim, self.hidden = in_dim, hidden

    def init(self, key) -> Params:
        k1, k2, k3, k4 = jax.random.split(key, 4)
        s = 1.0 / math.sqrt(self.hidden)
        return {
            "wx": _uniform(k1, (self.in_dim, 3 * self.hidden), s),
            "wh": _uniform(k2, (self.hidden, 3 * self.hidden), s),
            "bx": _uniform(k3, (3 * self.hidden,), s),
            "bh": _uniform(k4, (3 * self.hidden,), s),
        }

    def initial_state(self, batch: int, dtype=jnp.float32):
        return jnp.zeros((batch, self.hidden), dtype)

    def __call__(self, p: Params, h, x):
        gx = jnp.dot(x, p["wx"]) + p["bx"]
        gh = jnp.dot(h, p["wh"]) + p["bh"]
        rx, zx, nx = jnp.split(gx, 3, axis=-1)
        rh, zh, nh = jnp.split(gh, 3, axis=-1)
        r = jax.nn.sigmoid(rx + rh)
        z = jax.nn.sigmoid(zx + zh)
        n = jnp.tanh(nx + r * nh)
        h = (1.0 - z) * n + z * h
        return h, h


def _scan_cell(cell, p: Params, xs, init_state, reverse: bool = False):
    """Run a cell over time axis 1 of xs [B, T, C]."""

    def step(state, x_t):
        return cell(p, state, x_t)

    xs_t = jnp.swapaxes(xs, 0, 1)  # [T, B, C] for scan
    _, ys = lax.scan(step, init_state, xs_t, reverse=reverse)
    return jnp.swapaxes(ys, 0, 1)


def lstm(cell: LSTMCell, p: Params, xs, reverse: bool = False):
    """[B, T, C] -> [B, T, H] forward (or reverse) LSTM pass."""
    return _scan_cell(cell, p, xs, cell.initial_state(xs.shape[0], xs.dtype), reverse)


def gru(cell: GRUCell, p: Params, xs, reverse: bool = False):
    return _scan_cell(cell, p, xs, cell.initial_state(xs.shape[0], xs.dtype), reverse)


def bilstm(cell_fwd: LSTMCell, cell_bwd: LSTMCell, p_fwd: Params, p_bwd: Params,
           xs, lengths=None):
    """Bidirectional LSTM, concat of forward and backward passes.

    With `lengths`, the backward pass must not start inside padding: padded
    steps are masked to zero input and, critically, the backward outputs for
    valid positions are computed over the reversed VALID region. We implement
    this by masking inputs and relying on zero-input steps before the valid
    region (h stays near the zero-input fixed point). For exactness we instead
    roll each sequence so its valid region is right-aligned, scan, and roll
    back — static shapes, per-sample shifts via gather.
    """
    if lengths is None:
        out_f = lstm(cell_fwd, p_fwd, xs)
        out_b = lstm(cell_bwd, p_bwd, xs, reverse=True)
        return jnp.concatenate([out_f, out_b], axis=-1)

    B, T, _ = xs.shape
    shift = (T - lengths)[:, None]  # [B,1] right-align amount
    pos = jnp.arange(T)[None, :]
    # gather indices rolling valid region to the right: src = pos - shift
    src = jnp.clip(pos - shift, 0, T - 1)
    mask = (pos >= shift).astype(xs.dtype)
    xs_right = jnp.take_along_axis(xs, src[..., None], axis=1) * mask[..., None]

    out_f = lstm(cell_fwd, p_fwd, xs)  # forward: padding is at the END, harmless
    out_b_right = lstm(cell_bwd, p_bwd, xs_right, reverse=True)
    # roll back: dst = pos + shift
    dst = jnp.clip(pos + shift, 0, T - 1)
    out_b = jnp.take_along_axis(out_b_right, dst[..., None], axis=1)
    valid = (pos < lengths[:, None]).astype(xs.dtype)[..., None]
    return jnp.concatenate([out_f, out_b], axis=-1) * valid
