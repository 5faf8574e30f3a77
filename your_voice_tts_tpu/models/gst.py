"""Global Style Tokens (reference layers/gst_layers.py; SURVEY.md SS2.1 GST).

ReferenceEncoder: 6x strided 3x3 conv + BN over the style mel, GRU summary.
StyleTokenLayer: multi-head attention of the reference embedding over a bank
of learned style tokens. Output is projected to the encoder width and summed
into encoder outputs by the model (design note: the reference's
gst_embedding_dim must match its encoder width for the same sum; we keep a
projection so any token dim works).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax import lax

from ..config import GSTConfig
from ..nn.core import BatchNorm1d, Dense, Params, _host_rng, xavier_uniform
from ..nn.rnn import GRUCell, gru


class ReferenceEncoder:
    CHANNELS = (32, 32, 64, 64, 128, 128)

    def __init__(self, n_mels: int, out_dim: int = 128):
        self.n_mels = n_mels
        self.out_dim = out_dim
        self.bns = [BatchNorm1d(ch) for ch in self.CHANNELS]
        # frequency size after 6 stride-2 convs
        f = n_mels
        for _ in self.CHANNELS:
            f = (f + 1) // 2
        self.gru_cell = GRUCell(f * self.CHANNELS[-1], out_dim)

    def init(self, key) -> Params:
        ks = jax.random.split(key, len(self.CHANNELS) + 1)
        convs = []
        in_ch = 1
        for i, (ch, bn) in enumerate(zip(self.CHANNELS, self.bns)):
            convs.append({
                "w": xavier_uniform(ks[i], (3, 3 * in_ch, ch)).reshape(3, 3, in_ch, ch),
                "b": jnp.zeros((ch,)),
                "bn": bn.init(),
            })
            in_ch = ch
        return {"convs": convs, "gru": self.gru_cell.init(ks[-1])}

    def init_state(self) -> Params:
        return {"convs": [bn.init_state() for bn in self.bns]}

    def __call__(self, p: Params, state: Params, mel, train: bool = False,
                 style_len=None):
        """mel: [B, T, n_mels] -> ([B, out_dim] style summary, new state).

        Real BatchNorm with running stats (torch parity): batch statistics
        in training, running statistics at inference. (The earlier
        instance-norm stand-in collapsed to a CONSTANT embedding once the
        strided convs reduced the spatial extent to one position — style
        conditioning silently died for every input.)"""
        x = mel[..., None]  # NHWC: [B, T, n_mels, 1]
        new_state: Params = {"convs": []}
        for cp, bn, st in zip(p["convs"], self.bns, state["convs"]):
            # explicit (1,1) padding = torch Conv2d(k=3, stride=2, pad=1):
            # stride-2 SAME would sample a grid offset by one on even sizes,
            # breaking imported-checkpoint parity
            x = lax.conv_general_dilated(
                x, cp["w"], window_strides=(2, 2), padding=((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC")) + cp["b"]
            x, ns = bn(cp["bn"], st, x, train)  # reduces (B, T, F) per ch
            new_state["convs"].append(ns)
            x = jax.nn.relu(x)
        B, T, F, C = x.shape
        x = x.reshape(B, T, F * C)
        out = gru(self.gru_cell, p["gru"], x)
        if style_len is not None:
            # summarize at the last REAL frame: each stride-2 conv maps
            # length L -> (L+1)//2 (explicit (1,1) padding), so a padded
            # batch row's style is not read off pure-padding timesteps.
            # (The reference always takes the last step — strictly worse
            # under padding; parity holds whenever style_len is omitted.)
            L = style_len
            for _ in self.CHANNELS:
                L = (L + 1) // 2
            idx = jnp.clip(L - 1, 0, out.shape[1] - 1)
            return out[jnp.arange(B), idx], new_state
        return out[:, -1, :], new_state


class StyleTokenLayer:
    def __init__(self, query_dim: int, num_tokens: int, token_dim: int, num_heads: int):
        self.num_tokens = num_tokens
        self.token_dim = token_dim
        self.num_heads = num_heads
        self.query_dim = query_dim
        self.q_proj = Dense(query_dim, token_dim, use_bias=False)
        self.k_proj = Dense(token_dim // num_heads, token_dim, use_bias=False)
        self.v_proj = Dense(token_dim // num_heads, token_dim, use_bias=False)

    def init(self, key) -> Params:
        k0, k1, k2, k3 = jax.random.split(key, 4)
        return {
            "tokens": jnp.asarray(
                _host_rng(k0).standard_normal(
                    (self.num_tokens, self.token_dim // self.num_heads)) * 0.5,
                jnp.float32),
            "q": self.q_proj.init(k1),
            "k": self.k_proj.init(k2),
            "v": self.v_proj.init(k3),
        }

    def __call__(self, p: Params, query):
        """query [B, query_dim] -> style embedding [B, token_dim]."""
        B = query.shape[0]
        H, D = self.num_heads, self.token_dim // self.num_heads
        tokens = jnp.tanh(p["tokens"])                         # [N, D]
        q = self.q_proj(p["q"], query).reshape(B, H, D)        # [B, H, D]
        k = self.k_proj(p["k"], tokens).reshape(self.num_tokens, H, D)
        v = self.v_proj(p["v"], tokens).reshape(self.num_tokens, H, D)
        scores = jnp.einsum("bhd,nhd->bhn", q, k) / math.sqrt(D)
        w = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhn,nhd->bhd", w, v).reshape(B, H * D)
        return out


class GST:
    def __init__(self, n_mels: int, encoder_dim: int, cfg: GSTConfig | None = None):
        cfg = cfg or GSTConfig()
        self.cfg = cfg
        self.ref_encoder = ReferenceEncoder(n_mels, 128)
        self.style_layer = StyleTokenLayer(128, cfg.gst_style_tokens,
                                           cfg.gst_embedding_dim, cfg.gst_num_heads)
        self.out_proj = Dense(cfg.gst_embedding_dim, encoder_dim)

    def init(self, key) -> Params:
        k0, k1, k2 = jax.random.split(key, 3)
        return {
            "ref": self.ref_encoder.init(k0),
            "style": self.style_layer.init(k1),
            "proj": self.out_proj.init(k2),
        }

    def init_state(self) -> Params:
        return {"ref": self.ref_encoder.init_state()}

    def __call__(self, p: Params, state: Params, style_mel, style_len=None,
                 train: bool = False):
        ref, ref_state = self.ref_encoder(p["ref"], state["ref"], style_mel,
                                          train, style_len=style_len)
        style = self.style_layer(p["style"], ref)
        return self.out_proj(p["proj"], style), {"ref": ref_state}
