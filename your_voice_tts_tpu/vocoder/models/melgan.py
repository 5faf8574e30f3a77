"""MelGAN generator + multi-scale discriminator (reference vocoder/models/
melgan_generator.py + melgan_multiscale_discriminator.py; SURVEY.md SS2.1
"Vocoder: MelGAN family").

Generator: conv7 -> [transposed-conv upsample x u + residual dilated stacks
(dilations 3^i)] per upsample factor -> conv7 -> tanh. One feed-forward XLA
program: mel [B, T, n_mels] -> audio [B, T*hop] in a single fused pass —
this is BASELINE config #2's vocoder.

Discriminator: 3 scales of strided-conv stacks over avg-pooled audio, each
returning (score map, feature maps) for LSGAN + feature-matching losses.
Weight-norm from the reference is folded into plain weights (inference
equivalent; training normalizes via optimizer dynamics instead).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...nn.core import Conv1d, ConvTranspose1d, Params


def _lrelu(x):
    return jax.nn.leaky_relu(x, 0.2)


class ResidualStack:
    """num_blocks dilated residual blocks (dilation k^i), MelGAN-style, with
    the reference's learned 1x1 conv shortcuts and reflection padding
    (reference vocoder/layers/melgan.py ResidualStack: out = shortcut(x) +
    blocks(x)) — so trained reference generators transfer exactly
    (utils/torch_import.py)."""

    def __init__(self, channels: int, num_blocks: int = 3, kernel_size: int = 3):
        self.blocks = []
        for i in range(num_blocks):
            d = kernel_size ** i
            self.blocks.append((
                Conv1d(channels, channels, kernel_size, padding="same",
                       dilation=d, init_gain="relu", pad_mode="reflect"),
                Conv1d(channels, channels, 1, init_gain="linear"),
                Conv1d(channels, channels, 1, init_gain="linear"),
            ))

    def init(self, key) -> Params:
        ks = jax.random.split(key, 3 * len(self.blocks))
        return {"blocks": [
            {"c1": c1.init(ks[3 * i]), "c2": c2.init(ks[3 * i + 1]),
             "sc": sc.init(ks[3 * i + 2])}
            for i, (c1, c2, sc) in enumerate(self.blocks)]}

    def __call__(self, p: Params, x):
        for (c1, c2, sc), bp in zip(self.blocks, p["blocks"]):
            y = c1(bp["c1"], _lrelu(x))
            y = c2(bp["c2"], _lrelu(y))
            x = sc(bp["sc"], x) + y
        return x


class MelganGenerator:
    def __init__(self, n_mels: int = 80, upsample_factors=(8, 8, 2, 2),
                 base_channels: int = 512, num_res_blocks: int = 3,
                 kernel_size: int = 7):
        self.n_mels = n_mels
        self.hop = 1
        for u in upsample_factors:
            self.hop *= u
        self.conv_in = Conv1d(n_mels, base_channels, kernel_size,
                              init_gain="linear", pad_mode="reflect")
        self.ups = []
        ch = base_channels
        for u in upsample_factors:
            self.ups.append((
                ConvTranspose1d(ch, ch // 2, 2 * u, u, init_gain="relu"),
                ResidualStack(ch // 2, num_res_blocks),
            ))
            ch //= 2
        self.conv_out = Conv1d(ch, 1, kernel_size, init_gain="tanh",
                               pad_mode="reflect")

    def init(self, key) -> Params:
        ks = jax.random.split(key, 2 + 2 * len(self.ups))
        p: Params = {"conv_in": self.conv_in.init(ks[0]), "ups": []}
        for i, (up, res) in enumerate(self.ups):
            p["ups"].append({"up": up.init(ks[1 + 2 * i]),
                             "res": res.init(ks[2 + 2 * i])})
        p["conv_out"] = self.conv_out.init(ks[-1])
        return p

    def __call__(self, p: Params, mel):
        """mel [B, T, n_mels] -> audio [B, T*hop]."""
        x = self.conv_in(p["conv_in"], mel)
        for (up, res), up_p in zip(self.ups, p["ups"]):
            x = up(up_p["up"], _lrelu(x))
            x = res(up_p["res"], x)
        x = self.conv_out(p["conv_out"], _lrelu(x))
        return jnp.tanh(x)[..., 0]


class MelganDiscriminator:
    """One scale: strided conv stack -> (score, feature maps)."""

    LAYERS = [  # (out_mult, kernel, stride)
        (1, 15, 1), (4, 41, 4), (16, 41, 4), (64, 41, 4),
        (64, 5, 1),
    ]

    def __init__(self, base_channels: int = 16):
        self.convs = []
        in_ch = 1
        for mult, k, s in self.LAYERS:
            out_ch = min(base_channels * mult, 1024)
            # reference downsampling convs are GROUPED (groups = in//4):
            # dense convs would inflate discriminator params/FLOPs ~4x and
            # change the adversarial dynamics vs the reference recipe
            groups = max(1, in_ch // 4) if s > 1 else 1
            self.convs.append(Conv1d(in_ch, out_ch, k, stride=s, padding=k // 2,
                                     init_gain="relu", groups=groups))
            in_ch = out_ch
        self.conv_out = Conv1d(in_ch, 1, 3, padding=1, init_gain="linear")

    def init(self, key) -> Params:
        ks = jax.random.split(key, len(self.convs) + 1)
        return {"convs": [c.init(k) for c, k in zip(self.convs, ks)],
                "out": self.conv_out.init(ks[-1])}

    def __call__(self, p: Params, x):
        """x [B, T] -> (score [B, T', 1], [feature maps])."""
        feats = []
        h = x[..., None]
        for conv, cp in zip(self.convs, p["convs"]):
            h = _lrelu(conv(cp, h))
            feats.append(h)
        score = self.conv_out(p["out"], h)
        return score, feats


class MelganMultiscaleDiscriminator:
    def __init__(self, num_scales: int = 3, base_channels: int = 16):
        self.scales = [MelganDiscriminator(base_channels) for _ in range(num_scales)]

    def init(self, key) -> Params:
        ks = jax.random.split(key, len(self.scales))
        return {"scales": [d.init(k) for d, k in zip(self.scales, ks)]}

    def __call__(self, p: Params, x):
        """Returns list of (score, feats) per scale; input avg-pooled 2x
        between scales."""
        outs = []
        h = x
        for d, dp in zip(self.scales, p["scales"]):
            outs.append(d(dp, h))
            # stride-2 average pooling (kernel 4, same as reference)
            h = jax.lax.reduce_window(
                h, 0.0, jax.lax.add, (1, 4), (1, 2), "SAME") / 4.0
        return outs
