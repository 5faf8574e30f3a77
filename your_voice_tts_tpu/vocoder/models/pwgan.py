"""Parallel WaveGAN (Yamamoto 2020) generator + discriminator (reference
vocoder/models/parallel_wavegan_*.py; SURVEY.md SS2.1 "MelGAN family" lists
the PWGAN variant).

Non-autoregressive WaveNet: gaussian noise in, gated dilated-conv residual
stack conditioned on upsampled mels, skip-sum head. One feed-forward XLA
program — same serving shape as MelGAN, different inductive bias. Trained
with the shared multi-res STFT + LSGAN losses (vocoder/losses.py,
train_gan.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...nn.core import Conv1d, Params
from .wavernn import _stretch  # one nearest-neighbor upsample definition


class PWGANResBlock:
    """Gated residual block: dilated conv -> (tanh * sigmoid) with mel
    conditioning -> 1x1 residual + skip."""

    def __init__(self, residual_ch: int, gate_ch: int, skip_ch: int,
                 aux_ch: int, kernel_size: int, dilation: int):
        self.conv = Conv1d(residual_ch, gate_ch, kernel_size, padding="same",
                           dilation=dilation, init_gain="linear")
        self.cond = Conv1d(aux_ch, gate_ch, 1, use_bias=False, init_gain="linear")
        half = gate_ch // 2
        self.res_out = Conv1d(half, residual_ch, 1, init_gain="linear")
        self.skip_out = Conv1d(half, skip_ch, 1, init_gain="linear")
        self.half = half

    def init(self, key) -> Params:
        ks = jax.random.split(key, 4)
        return {"conv": self.conv.init(ks[0]), "cond": self.cond.init(ks[1]),
                "res": self.res_out.init(ks[2]), "skip": self.skip_out.init(ks[3])}

    def __call__(self, p: Params, x, c):
        h = self.conv(p["conv"], x) + self.cond(p["cond"], c)
        t, s = h[..., : self.half], h[..., self.half:]
        z = jnp.tanh(t) * jax.nn.sigmoid(s)
        res = self.res_out(p["res"], z)
        skip = self.skip_out(p["skip"], z)
        return (x + res) * (0.5 ** 0.5), skip


class ParallelWaveganGenerator:
    def __init__(self, n_mels: int = 80, num_layers: int = 30, stacks: int = 3,
                 residual_ch: int = 64, gate_ch: int = 128, skip_ch: int = 64,
                 kernel_size: int = 3, upsample_factors=(4, 4, 4, 4),
                 aux_context_window: int = 0):
        self.n_mels = n_mels
        self.hop = 1
        for u in upsample_factors:
            self.hop *= u
        self.factors = tuple(upsample_factors)
        # reference conv_in context conv (aux_context_window mel frames each
        # side, edge-padded at inference so T is preserved)
        self.aux_context_window = aux_context_window
        if aux_context_window > 0:
            self.aux_conv = Conv1d(n_mels, n_mels,
                                   2 * aux_context_window + 1,
                                   padding="valid", use_bias=False,
                                   init_gain="linear")
        self.upsample_convs = [
            Conv1d(n_mels, n_mels, 2 * f + 1, padding="same", use_bias=False,
                   init_gain="linear") for f in self.factors]
        self.conv_in = Conv1d(1, residual_ch, 1, init_gain="linear")
        layers_per_stack = num_layers // stacks
        self.blocks = [
            PWGANResBlock(residual_ch, gate_ch, skip_ch, n_mels, kernel_size,
                          2 ** (i % layers_per_stack))
            for i in range(num_layers)]
        self.out1 = Conv1d(skip_ch, skip_ch, 1, init_gain="relu")
        self.out2 = Conv1d(skip_ch, 1, 1, init_gain="linear")
        self.skip_scale = 1.0 / (len(self.blocks) ** 0.5)

    def init(self, key) -> Params:
        ks = jax.random.split(key, len(self.upsample_convs) + len(self.blocks) + 4)
        i = 0
        p: Params = {"up": []}
        if self.aux_context_window > 0:
            p["aux_conv"] = self.aux_conv.init(ks[-1])
        for conv in self.upsample_convs:
            cp = conv.init(ks[i]); i += 1
            cp["w"] = jnp.where(jnp.eye(conv.in_dim)[None] > 0,
                                jnp.full_like(cp["w"], 1.0 / conv.k), 0.0)
            p["up"].append(cp)
        p["conv_in"] = self.conv_in.init(ks[i]); i += 1
        p["blocks"] = []
        for b in self.blocks:
            p["blocks"].append(b.init(ks[i])); i += 1
        p["out1"] = self.out1.init(ks[i]); i += 1
        p["out2"] = self.out2.init(ks[i])
        return p

    def upsample(self, p: Params, mel):
        c = mel
        if self.aux_context_window > 0:
            w = self.aux_context_window
            c = jnp.pad(c, ((0, 0), (w, w), (0, 0)), mode="edge")
            c = self.aux_conv(p["aux_conv"], c)
        for conv, cp, f in zip(self.upsample_convs, p["up"], self.factors):
            c = conv(cp, _stretch(c, f))
        return c

    def __call__(self, p: Params, mel, noise=None, key=None):
        """mel [B, T, n_mels] (+ optional noise [B, T*hop]) -> audio [B, T*hop]."""
        c = self.upsample(p, mel)
        B, L, _ = c.shape
        if noise is None:
            key = key if key is not None else jax.random.PRNGKey(0)
            noise = jax.random.normal(key, (B, L), mel.dtype)
        x = self.conv_in(p["conv_in"], noise[..., None])
        skips = 0.0
        for block, bp in zip(self.blocks, p["blocks"]):
            x, s = block(bp, x, c)
            skips = skips + s
        h = jax.nn.relu(skips * self.skip_scale)
        h = jax.nn.relu(self.out1(p["out1"], h))
        return self.out2(p["out2"], h)[..., 0]


class ParallelWaveganDiscriminator:
    """10-layer dilated conv stack -> per-sample score map + features."""

    def __init__(self, num_layers: int = 10, channels: int = 64,
                 kernel_size: int = 3):
        self.convs = []
        in_ch = 1
        for i in range(num_layers - 1):
            self.convs.append(Conv1d(in_ch, channels, kernel_size,
                                     padding="same", dilation=max(1, i),
                                     init_gain="relu"))
            in_ch = channels
        self.conv_out = Conv1d(in_ch, 1, kernel_size, padding="same",
                               init_gain="linear")

    def init(self, key) -> Params:
        ks = jax.random.split(key, len(self.convs) + 1)
        return {"convs": [c.init(k) for c, k in zip(self.convs, ks)],
                "out": self.conv_out.init(ks[-1])}

    def __call__(self, p: Params, x):
        feats = []
        h = x[..., None]
        for conv, cp in zip(self.convs, p["convs"]):
            h = jax.nn.leaky_relu(conv(cp, h), 0.2)
            feats.append(h)
        return self.conv_out(p["out"], h), feats
