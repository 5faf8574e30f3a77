"""Attention family: location-sensitive, forward, windowed, Graves GMM.

Parity with the reference's attention classes (layers/common_layers.py:
`OriginalAttention` with location features / forward attention / transition
agent / windowing, `GravesAttention`, and the `init_attn` factory; SURVEY.md
SS2.1 "Common neural layers").

TPU-first shape: attention is a pure function of (state, query) -> (state,
context, alignment) designed to live INSIDE the decoder's `lax.scan` body.
Key projections of the encoder memory are precomputed once outside the loop.
All masking is arithmetic (no boolean indexing), so one compiled program
serves every batch.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..nn.core import Conv1d, Dense, Params


class AttentionState(NamedTuple):
    """Carried through the decoder scan."""
    attention: jnp.ndarray        # [B, T] previous alignment
    attention_cum: jnp.ndarray    # [B, T] cumulative alignment (location feature)
    alpha: jnp.ndarray            # [B, T] forward-attention recursion state
    win_idx: jnp.ndarray          # [B] window center (windowing at inference)
    mu: jnp.ndarray               # [B, K] Graves GMM means


class LocationSensitiveAttention:
    """Location-sensitive attention (Chorowski 2015), reference `OriginalAttention`.

    energies = v . tanh(W_q q + W_loc f_loc + W_k m); f_loc = conv31x32 over
    [prev_align, cum_align]. Optional sigmoid normalization (reference's
    `attention_norm: "sigmoid"` default), forward attention with transition
    agent (Zhang 2018), and inference-time windowing.
    """

    def __init__(self, query_dim: int, embedding_dim: int, attention_dim: int,
                 location_attention: bool = True, attention_location_n_filters: int = 32,
                 attention_location_kernel_size: int = 31, windowing: bool = False,
                 norm: str = "sigmoid", forward_attn: bool = False,
                 trans_agent: bool = False, forward_attn_mask: bool = False,
                 win_back: int = 1, win_front: int = 3):
        self.query_layer = Dense(query_dim, attention_dim, use_bias=False, init_gain="tanh")
        self.inputs_layer = Dense(embedding_dim, attention_dim, use_bias=False, init_gain="tanh")
        self.v = Dense(attention_dim, 1, use_bias=True)
        self.location_attention = location_attention
        if location_attention:
            self.location_conv = Conv1d(2, attention_location_n_filters,
                                        attention_location_kernel_size,
                                        padding="same", use_bias=False, init_gain="linear")
            self.location_dense = Dense(attention_location_n_filters, attention_dim,
                                        use_bias=False, init_gain="tanh")
        self.windowing = windowing
        self.win_back, self.win_front = win_back, win_front
        self.norm = norm
        self.forward_attn = forward_attn
        self.trans_agent = trans_agent
        self.forward_attn_mask = forward_attn_mask
        if trans_agent:
            self.ta = Dense(query_dim + embedding_dim, 1)
        self.query_dim = query_dim
        self.embedding_dim = embedding_dim

    def init(self, key) -> Params:
        ks = jax.random.split(key, 6)
        p: Params = {
            "query": self.query_layer.init(ks[0]),
            "inputs": self.inputs_layer.init(ks[1]),
            "v": self.v.init(ks[2]),
        }
        if self.location_attention:
            p["loc_conv"] = self.location_conv.init(ks[3])
            p["loc_dense"] = self.location_dense.init(ks[4])
        if self.trans_agent:
            p["ta"] = self.ta.init(ks[5])
        return p

    def init_state(self, batch: int, max_time: int, lengths=None) -> AttentionState:
        attention = jnp.zeros((batch, max_time))
        # forward attention: alpha starts as [1, 0, 0, ...]
        alpha = jnp.zeros((batch, max_time)).at[:, 0].set(1.0)
        return AttentionState(
            attention=attention,
            attention_cum=jnp.zeros((batch, max_time)),
            alpha=alpha,
            win_idx=jnp.zeros((batch,), jnp.int32),
            mu=jnp.zeros((batch, 1)),
        )

    def preprocess_inputs(self, p: Params, inputs):
        """Precompute W_k m once per utterance (outside the decoder scan)."""
        return self.inputs_layer(p["inputs"], inputs)

    def _energies(self, p: Params, query, processed_inputs, state: AttentionState):
        processed = self.query_layer(p["query"], query)[:, None, :]  # [B,1,A]
        if self.location_attention:
            # alignment state stays f32 across the scan (cumulative sums lose
            # precision in bf16); cast at the conv boundary so lax.conv sees
            # matching dtypes under the bf16 inference path
            cat = jnp.stack([state.attention, state.attention_cum],
                            axis=-1).astype(p["loc_conv"]["w"].dtype)  # [B,T,2]
            f = self.location_conv(p["loc_conv"], cat)                        # [B,T,F]
            processed = processed + self.location_dense(p["loc_dense"], f)
        e = self.v(p["v"], jnp.tanh(processed + processed_inputs))[..., 0]    # [B,T]
        return e

    def _apply_windowing(self, e, state: AttentionState, inference: bool):
        if not (self.windowing and inference):
            return e
        t = jnp.arange(e.shape[1])[None, :]
        lo = state.win_idx[:, None] - self.win_back
        hi = state.win_idx[:, None] + self.win_front
        inside = (t >= lo) & (t <= hi)
        return jnp.where(inside, e, -jnp.inf)

    def _normalize(self, e, mask):
        # alignments are f32 regardless of compute dtype: they accumulate
        # across the decode (attention_cum, forward-attention alpha) and the
        # [B, T_in] normalization is a trivial share of step FLOPs
        e = e.astype(jnp.float32)
        if mask is not None:
            e = jnp.where(mask, e, -jnp.inf)
        if self.norm == "softmax":
            return jax.nn.softmax(e, axis=-1)
        # sigmoid norm (reference default): sig(e) / sum sig(e)
        s = jax.nn.sigmoid(e)
        if mask is not None:
            s = jnp.where(mask, s, 0.0)
        return s / jnp.maximum(s.sum(axis=-1, keepdims=True), 1e-8)

    def _forward_attention(self, p: Params, alignment, query, context_prev,
                           state: AttentionState, mask):
        alpha_shift = jnp.pad(state.alpha[:, :-1], ((0, 0), (1, 0)))
        if self.trans_agent:
            ta_in = jnp.concatenate([context_prev, query], axis=-1)
            u = jax.nn.sigmoid(self.ta(p["ta"], ta_in))  # [B,1]
        else:
            u = 0.5
        alpha = ((1.0 - u) * state.alpha + u * alpha_shift + 1e-8) * alignment
        if self.forward_attn_mask:
            # hard forward mask: zero alpha more than 1 step behind the max
            fwd_max = jnp.argmax(alpha, axis=-1, keepdims=True)
            t = jnp.arange(alpha.shape[1])[None, :]
            alpha = jnp.where(t >= fwd_max - 1, alpha, 0.0)
            alpha = alpha + 1e-8
        if mask is not None:
            alpha = jnp.where(mask, alpha, 0.0)
        alpha = alpha / jnp.maximum(alpha.sum(axis=-1, keepdims=True), 1e-8)
        return alpha

    def __call__(self, p: Params, query, inputs, processed_inputs,
                 state: AttentionState, mask=None, context_prev=None,
                 inference: bool = False):
        """One attention step.

        query: [B, Q] attention-RNN hidden; inputs: [B, T, E] encoder memory;
        mask: [B, T] True at valid positions. Returns (new_state, context
        [B, E], alignment [B, T]).
        """
        e = self._energies(p, query, processed_inputs, state)
        e = self._apply_windowing(e, state, inference)
        alignment = self._normalize(e, mask)
        if self.forward_attn:
            if context_prev is None:
                context_prev = jnp.zeros((query.shape[0], self.embedding_dim), query.dtype)
            alignment = self._forward_attention(p, alignment, query, context_prev, state, mask)
        context = jnp.einsum("bt,bte->be", alignment, inputs)
        new_state = AttentionState(
            attention=alignment,
            attention_cum=state.attention_cum + alignment,
            alpha=alignment if self.forward_attn else state.alpha,
            win_idx=jnp.argmax(alignment, axis=-1).astype(jnp.int32),
            mu=state.mu,
        )
        return new_state, context, alignment


class GravesAttention:
    """Graves (2013) GMM attention, reference `GravesAttention` (K components,
    monotonic means via softplus steps)."""

    COEF = 0.3989422917366028  # 1/sqrt(2*pi)

    def __init__(self, query_dim: int, K: int = 4):
        self.K = K
        self.query_dim = query_dim
        self.l1 = Dense(query_dim, query_dim, use_bias=True, init_gain="relu")
        self.l2 = Dense(query_dim, 3 * K, use_bias=True)

    def init(self, key) -> Params:
        k1, k2 = jax.random.split(key)
        p = {"l1": self.l1.init(k1), "l2": self.l2.init(k2)}
        # reference initializes the (sig, mu-step) biases to favor forward motion
        b = p["l2"]["b"]
        b = b.at[self.K: 2 * self.K].set(10.0)   # sig bias
        b = b.at[2 * self.K:].set(0.5)           # step bias
        p["l2"]["b"] = b
        return p

    def init_state(self, batch: int, max_time: int, lengths=None) -> AttentionState:
        return AttentionState(
            attention=jnp.zeros((batch, max_time)),
            attention_cum=jnp.zeros((batch, max_time)),
            alpha=jnp.zeros((batch, max_time)),
            win_idx=jnp.zeros((batch,), jnp.int32),
            mu=jnp.zeros((batch, self.K)),
        )

    def preprocess_inputs(self, p: Params, inputs):
        return None

    def __call__(self, p: Params, query, inputs, processed_inputs,
                 state: AttentionState, mask=None, context_prev=None,
                 inference: bool = False):
        gbk = self.l2(p["l2"], jnp.tanh(self.l1(p["l1"], query)))  # [B, 3K]
        g, b, k = jnp.split(gbk, 3, axis=-1)
        sig = jax.nn.softplus(b) + 1e-5
        mu = state.mu + jax.nn.softplus(k)
        g = jax.nn.softmax(g, axis=-1) + 1e-5
        j = jnp.arange(inputs.shape[1])[None, None, :]  # [1,1,T]
        phi = g[..., None] * jnp.exp(-0.5 * ((mu[..., None] - j) / sig[..., None]) ** 2)
        alignment = self.COEF * phi.sum(axis=1)  # [B,T]
        if mask is not None:
            alignment = jnp.where(mask, alignment, 0.0)
        alignment = alignment / jnp.maximum(alignment.sum(-1, keepdims=True), 1e-8)
        context = jnp.einsum("bt,bte->be", alignment, inputs)
        new_state = AttentionState(
            attention=alignment,
            attention_cum=state.attention_cum + alignment,
            alpha=state.alpha,
            win_idx=state.win_idx,
            mu=mu,
        )
        return new_state, context, alignment


def init_attn(attn_type: str, query_dim: int, embedding_dim: int, attention_dim: int,
              location_attention: bool, attention_location_n_filters: int,
              attention_location_kernel_size: int, windowing: bool, norm: str,
              forward_attn: bool, trans_agent: bool, forward_attn_mask: bool,
              attn_K: int = 4, win_back: int = 1, win_front: int = 3):
    """Factory with reference signature (common_layers.init_attn)."""
    if attn_type == "original":
        return LocationSensitiveAttention(
            query_dim, embedding_dim, attention_dim, location_attention,
            attention_location_n_filters, attention_location_kernel_size,
            windowing, norm, forward_attn, trans_agent, forward_attn_mask,
            win_back=win_back, win_front=win_front)
    if attn_type == "graves":
        return GravesAttention(query_dim, attn_K)
    raise ValueError(f"unknown attention type {attn_type!r}")
