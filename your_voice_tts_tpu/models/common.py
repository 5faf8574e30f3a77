"""Shared model building blocks (reference layers/common_layers.py).

Prenet (with the always-on-dropout quirk), conv+BN blocks, and sequence-mask
helpers. Channel-last activations throughout.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..nn.core import BatchNorm1d, Conv1d, Dense, Params, prenet_dropout


def sequence_mask(lengths, max_len: int):
    """[B] lengths -> [B, max_len] bool validity mask."""
    return jnp.arange(max_len)[None, :] < lengths[:, None]


def cast_compute(params, state, compute_dtype, *extras):
    """Cast float params/state (and optional conditioning inputs) to the
    inference compute dtype. bf16 keeps every decode matmul at the MXU's
    native precision; alignment math stays f32 (see models/attention.py) and
    outputs cast back to f32 at the model boundary (outputs_f32)."""
    from ..nn.core import tree_cast_floats

    if compute_dtype is None:
        return (params, state) + extras
    cast = lambda t: tree_cast_floats(t, compute_dtype)  # noqa: E731
    return (cast(params), cast(state)) + tuple(
        None if e is None else cast(e) for e in extras)


def outputs_f32(out: dict) -> dict:
    """Cast every float output back to f32 at the model boundary."""
    return {k: (v.astype(jnp.float32)
                if hasattr(v, "dtype") and jnp.issubdtype(v.dtype, jnp.floating)
                else v)
            for k, v in out.items()}


class Prenet:
    """2-layer bottleneck ahead of the decoder (reference common_layers.Prenet).

    prenet_type="original": Linear+ReLU+dropout(0.5) — dropout stays ON at
    inference (Tacotron2 paper SS2.2; the reference honors this quirk).
    prenet_type="bn": Linear+BatchNorm+ReLU, no dropout.
    """

    def __init__(self, in_dim: int, prenet_type: str = "original",
                 prenet_dropout: bool = True, out_dims: tuple[int, ...] = (256, 256)):
        self.prenet_type = prenet_type
        self.dropout_enabled = prenet_dropout
        dims = (in_dim,) + tuple(out_dims)
        self.linears = [Dense(dims[i], dims[i + 1], use_bias=(prenet_type == "original"))
                        for i in range(len(out_dims))]
        if prenet_type == "bn":
            self.bns = [BatchNorm1d(d) for d in out_dims]

    def init(self, key) -> Params:
        ks = jax.random.split(key, len(self.linears))
        p: Params = {"linears": [l.init(k) for l, k in zip(self.linears, ks)]}
        if self.prenet_type == "bn":
            p["bns"] = [bn.init() for bn in self.bns]
        return p

    def init_state(self) -> Params:
        if self.prenet_type == "bn":
            return {"bns": [bn.init_state() for bn in self.bns]}
        return {}

    def __call__(self, p: Params, state: Params, x, rng, train: bool):
        new_state: Params = {"bns": []} if self.prenet_type == "bn" else {}
        for i, lin in enumerate(self.linears):
            x = lin(p["linears"][i], x)
            if self.prenet_type == "bn":
                x, ns = self.bns[i](p["bns"][i], state["bns"][i], x, train)
                new_state["bns"].append(ns)
                x = jax.nn.relu(x)
            else:
                x = jax.nn.relu(x)
                # dropout stays on even at eval (reference quirk); rng=None
                # disables it — model inference entry points substitute a
                # fixed key so the quirk holds by default
                if self.dropout_enabled and rng is not None:
                    rng, sub = jax.random.split(rng)
                    x = prenet_dropout(sub, x, 0.5, True)
        return x, new_state


def pallas_prenet(prenet, cfg, p: Params, state: Params | None):
    """(possibly-folded decoder params, in-kernel dropout flag) for the
    weights-in-VMEM decode kernels — one definition for both decoders. BN
    prenets fold their running-stats affine into the Linears
    (fold_bn_prenet) and never apply dropout."""
    if prenet.prenet_type == "bn":
        assert state is not None, \
            "BN-prenet kernel decode needs the decoder state (running stats)"
        return {**p, "prenet": fold_bn_prenet(p["prenet"],
                                              state["prenet"])}, False
    return p, cfg.prenet_dropout and prenet.dropout_enabled


def fold_bn_prenet(p: Params, s: Params, eps: float = 1e-5) -> Params:
    """Fold an inference-mode BN prenet into plain Linear+bias params.

    prenet_type="bn" is Linear(no bias) -> BatchNorm(running stats) -> ReLU;
    at inference BN is the affine y = scale*(x - mean)/sqrt(var+eps) + bias,
    so each layer collapses to x @ (W * scale/std) + (bias - mean*scale/std)
    — exactly the "original" prenet's Linear shape (dropout off). This is
    what lets the weights-in-VMEM decode kernels serve BN-prenet configs
    without any in-kernel BN support (taco2_decode.supported_config)."""
    linears = []
    for lin, bn, st in zip(p["linears"], p["bns"], s["bns"]):
        k = bn["scale"] * jax.lax.rsqrt(st["var"].astype(jnp.float32) + eps)
        linears.append({"w": lin["w"] * k,
                        "b": bn["bias"] - st["mean"] * k})
    return {"linears": linears}


class ConvBNBlock:
    """conv(k) + BatchNorm + activation + dropout(0.5) (reference ConvBNBlock)."""

    def __init__(self, in_dim: int, out_dim: int, kernel_size: int,
                 activation: str | None = "relu", dropout: float = 0.5):
        gain = activation if activation in ("relu", "tanh") else "linear"
        self.conv = Conv1d(in_dim, out_dim, kernel_size, padding="same", init_gain=gain)
        self.bn = BatchNorm1d(out_dim)
        self.activation = activation
        self.dropout = dropout

    def init(self, key) -> Params:
        return {"conv": self.conv.init(key), "bn": self.bn.init()}

    def init_state(self) -> Params:
        return {"bn": self.bn.init_state()}

    def __call__(self, p: Params, state: Params, x, rng, train: bool, mask=None):
        x = self.conv(p["conv"], x)
        x, bn_state = self.bn(p["bn"], state["bn"], x, train, mask=mask)
        if self.activation == "relu":
            x = jax.nn.relu(x)
        elif self.activation == "tanh":
            x = jnp.tanh(x)
        if train and self.dropout > 0 and rng is not None:
            keep = 1.0 - self.dropout
            x = jnp.where(jax.random.bernoulli(rng, keep, x.shape), x / keep, 0.0)
        return x, {"bn": bn_state}
