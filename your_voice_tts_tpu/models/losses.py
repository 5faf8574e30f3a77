"""Training losses (reference layers/losses.py; SURVEY.md SS2.1 "Losses").

Masked L1/MSE with optional per-sample sequence-length normalization, masked
BCE-with-logits for the stop token (pos_weight), guided-attention loss with a
soft diagonal prior, and the composite TacotronLoss.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .common import sequence_mask


def masked_l1(x, target, lengths, seq_len_norm: bool = False):
    """Reference L1LossMasked: sum(|x-t| * mask) / mask_count, or per-sample
    length-normalized weighting when seq_len_norm."""
    mask = sequence_mask(lengths, target.shape[1]).astype(x.dtype)[..., None]
    err = jnp.abs(x - target) * mask
    if seq_len_norm:
        norm_w = mask / jnp.maximum(mask.sum(axis=1, keepdims=True), 1.0)
        w = norm_w / (target.shape[0] * target.shape[2])
        return (err * w).sum()
    return err.sum() / jnp.maximum(mask.sum() * target.shape[2], 1.0)


def masked_mse(x, target, lengths, seq_len_norm: bool = False):
    mask = sequence_mask(lengths, target.shape[1]).astype(x.dtype)[..., None]
    err = ((x - target) ** 2) * mask
    if seq_len_norm:
        norm_w = mask / jnp.maximum(mask.sum(axis=1, keepdims=True), 1.0)
        w = norm_w / (target.shape[0] * target.shape[2])
        return (err * w).sum()
    return err.sum() / jnp.maximum(mask.sum() * target.shape[2], 1.0)


def masked_bce_logits(logits, targets, lengths, pos_weight: float = 1.0):
    """Reference BCELossMasked with pos_weight on the positive (stop) class.
    logits/targets: [B, T_r]; lengths in decoder steps."""
    mask = sequence_mask(lengths, targets.shape[1]).astype(logits.dtype)
    log_p = jax.nn.log_sigmoid(logits)
    log_not_p = jax.nn.log_sigmoid(-logits)
    loss = -(pos_weight * targets * log_p + (1.0 - targets) * log_not_p)
    return (loss * mask).sum() / jnp.maximum(mask.sum(), 1.0)


def guided_attention_loss(alignments, input_lengths, decoder_lengths,
                          sigma: float = 0.4):
    """Soft-diagonal attention prior (Tachibana 2017; reference
    GuidedAttentionLoss). alignments: [B, T_dec, T_in]."""
    B, T_dec, T_in = alignments.shape
    n = jnp.arange(T_dec)[None, :, None] / jnp.maximum(decoder_lengths, 1)[:, None, None]
    t = jnp.arange(T_in)[None, None, :] / jnp.maximum(input_lengths, 1)[:, None, None]
    W = 1.0 - jnp.exp(-((n - t) ** 2) / (2.0 * sigma ** 2))
    in_mask = sequence_mask(input_lengths, T_in)[:, None, :]
    dec_mask = sequence_mask(decoder_lengths, T_dec)[:, :, None]
    mask = (in_mask & dec_mask).astype(alignments.dtype)
    return (alignments * W * mask).sum() / jnp.maximum(mask.sum(), 1.0)


class TacotronLoss:
    """Composite loss (reference TacotronLoss): decoder + postnet regression,
    stopnet BCE, guided attention with step-decayed weight."""

    def __init__(self, model_name: str = "Tacotron2", loss_masking: bool = True,
                 seq_len_norm: bool = False, stopnet: bool = True,
                 stopnet_pos_weight: float = 10.0, ga_alpha: float = 10.0,
                 ga_sigma: float = 0.4, ga_decay_steps: int = 10000,
                 decoder_alpha: float = 0.25, postnet_alpha: float = 0.25):
        # Tacotron2 regresses with MSE, Tacotron(1) with L1 (reference setup)
        self.use_mse = model_name == "Tacotron2"
        self.loss_masking = loss_masking
        self.seq_len_norm = seq_len_norm
        self.stopnet = stopnet
        self.pos_weight = stopnet_pos_weight
        self.ga_alpha = ga_alpha
        self.ga_sigma = ga_sigma
        self.ga_decay_steps = ga_decay_steps
        self.decoder_alpha = decoder_alpha
        self.postnet_alpha = postnet_alpha

    def _reg(self, x, target, lengths):
        if self.loss_masking:
            fn = masked_mse if self.use_mse else masked_l1
            return fn(x, target, lengths, self.seq_len_norm)
        err = (x - target) ** 2 if self.use_mse else jnp.abs(x - target)
        return err.mean()

    def __call__(self, outputs: dict, mel_target, mel_lengths, stop_targets,
                 input_lengths, step=None, r: int = 1, linear_target=None,
                 n_priority_freq: int = 0):
        """outputs: model forward dict. stop_targets: [B, T_r] (grouped by r).
        For Tacotron(1), `linear_target` is the linear spectrogram the postnet
        head regresses (reference: 0.5 full-band + 0.5 priority band below
        ~3kHz). Returns (total, dict of components)."""
        decoder_loss = self._reg(outputs["decoder_outputs"], mel_target, mel_lengths)
        if linear_target is not None:
            post = outputs["postnet_outputs"]
            postnet_loss = self._reg(post, linear_target, mel_lengths)
            if n_priority_freq > 0:
                postnet_loss = 0.5 * postnet_loss + 0.5 * self._reg(
                    post[..., :n_priority_freq],
                    linear_target[..., :n_priority_freq], mel_lengths)
        else:
            postnet_loss = self._reg(outputs["postnet_outputs"], mel_target,
                                     mel_lengths)
        total = self.decoder_alpha * decoder_loss + self.postnet_alpha * postnet_loss
        parts = {"decoder_loss": decoder_loss, "postnet_loss": postnet_loss}

        if "decoder_backward_outputs" in outputs:
            # bidirectional decoder: backward regression + fwd/bwd consistency
            dec_b = outputs["decoder_backward_outputs"]
            backward_loss = self._reg(dec_b, mel_target, mel_lengths)
            consistency = self._reg(
                dec_b, jax.lax.stop_gradient(outputs["decoder_outputs"]),
                mel_lengths)
            total = total + self.decoder_alpha * backward_loss + consistency
            parts["decoder_b_loss"] = backward_loss
            parts["decoder_c_loss"] = consistency

        if self.stopnet:
            dec_steps = (mel_lengths + r - 1) // r
            stop_loss = masked_bce_logits(outputs["stop_logits"], stop_targets,
                                          dec_steps, self.pos_weight)
            total = total + stop_loss
            parts["stopnet_loss"] = stop_loss

        if self.ga_alpha > 0:
            dec_steps = (mel_lengths + r - 1) // r
            ga = guided_attention_loss(outputs["alignments"], input_lengths,
                                       dec_steps, self.ga_sigma)
            # reference decays the GA weight over training steps
            if step is not None and self.ga_decay_steps > 0:
                decay = jnp.maximum(0.0, 1.0 - step / (10.0 * self.ga_decay_steps))
                weight = self.ga_alpha * decay
            else:
                weight = self.ga_alpha
            total = total + weight * ga
            parts["ga_loss"] = ga

        parts["loss"] = total
        return total, parts
