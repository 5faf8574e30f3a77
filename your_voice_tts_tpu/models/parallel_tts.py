"""ParallelTTS — a NON-autoregressive, TPU-first model family.

The Tacotron family's training/serving ceiling on TPU is the serial
teacher-forced recurrence: 200 sequential decoder steps bound the step at
MFU ~0.18 even at the measured B=384 knee (STATUS.md round-4 writeup —
"the remaining levers are architectural"). This module IS that lever: a
duration-based parallel model (FastSpeech/SpeedySpeech-style recipe) whose
entire forward is batched convolutions and matmuls — no `lax.scan`, no
per-step serial chain — so the MXU sees one large fused graph for the whole
utterance and serving is O(1) launches regardless of length.

Not a port of any reference file (the reference is autoregressive-only;
SURVEY.md §2 lists no parallel family): this extends the rebuild beyond
reference parity along the axis its roofline analysis identified.

Pieces:
- text encoder: the same conv+BiLSTM encoder as Tacotron2 (shared module).
- duration predictor: conv stack over (stop-gradient) encoder states →
  per-token log-durations (trained on teacher durations; see
  `bin/extract_durations.py` for extracting them from a trained Tacotron2's
  alignments, or uniform durations for smoke runs).
- length regulator: static-shape expansion — frame i of row b reads token
  `idx[b, i] = #{t : cum_dur[b, t] <= i}` via one comparison-sum and one
  gather. No scatter, no ragged shapes; frames past the row's total are
  masked. (The classic repeat-interleave is a scatter — this formulation is
  the TPU-friendly transpose of it.)
- decoder: residual ConvBN blocks over the expanded states + linear mel
  head, then the standard Tacotron2 postnet as a refiner.

API mirrors the autoregressive models (`init/forward/inference` with
`postnet_outputs`/`mel_lengths`/`alignments` keys), so the existing
synthesis/serving/vocoder stack drives it unchanged.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..nn.core import Conv1d, Dense, Embedding, LayerNorm
from .common import sequence_mask
from .tacotron2 import Encoder, Postnet

Params = dict


class ConvLNBlock:
    """conv(k) + LayerNorm + ReLU + dropout — the parallel family's block.

    LayerNorm, NOT BatchNorm: length-sorted buckets give each batch
    systematically different statistics (short vs long utterances), so BN's
    running average matches none of them and eval-mode outputs collapse
    (measured: the duration predictor emitted ~0.5 for every token under
    running stats while tracking its targets under batch stats). LayerNorm
    is per-position and stateless — train and serve see identical math."""

    def __init__(self, in_dim: int, out_dim: int, kernel_size: int,
                 dropout: float = 0.1, dilation: int = 1):
        self.conv = Conv1d(in_dim, out_dim, kernel_size, padding="same",
                           init_gain="relu", dilation=dilation)
        self.ln = LayerNorm(out_dim)
        self.dropout = dropout

    def init(self, key) -> Params:
        return {"conv": self.conv.init(key), "ln": self.ln.init()}

    def __call__(self, p: Params, x, rng, train: bool, mask=None):
        x = self.conv(p["conv"], x)
        x = jax.nn.relu(self.ln(p["ln"], x))
        if train and self.dropout > 0 and rng is not None:
            keep = 1.0 - self.dropout
            x = jnp.where(jax.random.bernoulli(rng, keep, x.shape),
                          x / keep, 0.0)
        if mask is not None:
            x = x * mask[..., None].astype(x.dtype)
        return x


def length_regulate(enc_out, durations, max_frames: int):
    """Expand token states to frame states by integer durations.

    enc_out [B, T, D]; durations [B, T] int32 (frames per token, 0 for
    pad tokens). Returns (frames [B, max_frames, D], frame_mask
    [B, max_frames] bool, idx [B, max_frames] int32, total [B] int32).
    Rows whose total exceeds max_frames are truncated (static shapes)."""
    cum = jnp.cumsum(durations, axis=1)                      # [B, T]
    total = jnp.minimum(cum[:, -1], max_frames)
    i = jnp.arange(max_frames)[None, :, None]                # [1, M, 1]
    # frame i belongs to the first token whose cumulative end exceeds i
    idx = jnp.sum(i >= cum[:, None, :], axis=-1)             # [B, M]
    idx = jnp.minimum(idx, enc_out.shape[1] - 1).astype(jnp.int32)
    frames = jnp.take_along_axis(enc_out, idx[..., None], axis=1)
    frame_mask = jnp.arange(max_frames)[None, :] < total[:, None]
    return frames * frame_mask[..., None].astype(frames.dtype), \
        frame_mask, idx, total.astype(jnp.int32)


class ConvTextEncoder:
    """Scan-free text encoder for ParallelTTS (cfg.parallel_encoder="conv").

    The shared Tacotron2 encoder ends in a BiLSTM — two lax.scans over the
    token axis, a serial chain of ~2*T_text small matmuls that caps the
    otherwise fully-parallel family's step (round-5 profiling on v5e: see
    STATUS.md roofline). This encoder replaces it with residual dilated
    ConvLN blocks (dilations 1,2,4,1,...): same [B, T, D] -> [B, T, D]
    contract, receptive field ~2*sum(k*d)/2 tokens, zero serial structure —
    one fused XLA graph end to end. API mirrors tacotron2.Encoder
    ((params, state, x, lengths, rng, train) -> (out, state)) so the model
    swaps them freely; "shared" stays the default (checkpoint compat)."""

    def __init__(self, dim: int, n_blocks: int = 6, kernel: int = 5):
        self.blocks = [ConvLNBlock(dim, dim, kernel, dropout=0.1,
                                   dilation=(1, 2, 4)[i % 3])
                       for i in range(n_blocks)]

    def init(self, key) -> Params:
        ks = jax.random.split(key, len(self.blocks))
        return {"blocks": [b.init(k) for b, k in zip(self.blocks, ks)]}

    def init_state(self) -> Params:
        return {}

    def __call__(self, p: Params, state: Params, x, lengths, rng,
                 train: bool):
        mask = sequence_mask(lengths, x.shape[1])
        for i, blk in enumerate(self.blocks):
            sub = None
            if rng is not None:
                rng, sub = jax.random.split(rng)
            y = blk(p["blocks"][i], x, sub, train, mask=mask)
            x = (x + y) * mask[..., None].astype(x.dtype)
        return x, state


class DurationPredictor:
    """ConvLN stack + linear head → per-token log(1 + duration).
    Stateless (LayerNorm) — identical math at train and serve time."""

    def __init__(self, in_dim: int, hidden: int = 256, kernel: int = 3,
                 n_layers: int = 2, dropout: float = 0.1):
        dims = [in_dim] + [hidden] * n_layers
        self.blocks = [ConvLNBlock(dims[i], dims[i + 1], kernel,
                                   dropout=dropout)
                       for i in range(n_layers)]
        self.proj = Dense(hidden, 1)

    def init(self, key) -> Params:
        ks = jax.random.split(key, len(self.blocks) + 1)
        return {"blocks": [b.init(k) for b, k in zip(self.blocks, ks)],
                "proj": self.proj.init(ks[-1])}

    def __call__(self, p: Params, x, mask, rng, train: bool):
        for i, blk in enumerate(self.blocks):
            sub = None
            if rng is not None:
                rng, sub = jax.random.split(rng)
            x = blk(p["blocks"][i], x, sub, train, mask=mask)
        logd = self.proj(p["proj"], x)[..., 0]               # [B, T]
        return logd * mask.astype(logd.dtype)


class ParallelTTS:
    """Duration-based parallel text-to-mel model (module docstring).

    Round-5 conditioning additions (VERDICT r4 next #7), both OPT-IN so
    existing checkpoints load unchanged:
    - use_gst: global style tokens (shared `models/gst.py` module, the same
      one Tacotron2 uses) — the style embedding is ADDED to encoder states
      before duration prediction/length regulation, so style affects both
      prosody (durations) and spectral rendering. Training conditions on
      the target utterance (classic GST recipe); inference takes any
      reference mel via `style_mel`.
    - energy predictor (FastSpeech2-style variance adaptor): a ConvLN
      stack over the length-regulated frames predicts per-frame log-energy;
      TEACHER energy (masked mel-frame mean, computed by the trainer from
      the target mel) conditions the decoder during training, the model's
      own prediction at inference. Conditioning enters as a Dense(1->D)
      projection added to the frames."""

    def __init__(self, num_chars: int, cfg: ModelConfig, n_mels: int,
                 num_speakers: int = 0, speaker_embedding_dim: int = 0,
                 use_gst: bool = False, gst_cfg=None):
        self.cfg = cfg
        self.n_mels = n_mels
        self.num_speakers = num_speakers
        dim = cfg.encoder_dim
        self.embedding = Embedding(num_chars, cfg.embedding_dim)
        self.embed_proj = (Dense(cfg.embedding_dim, dim)
                           if cfg.embedding_dim != dim else None)
        if cfg.parallel_encoder == "conv":
            self.encoder = ConvTextEncoder(dim)
        else:  # "shared": the Tacotron2 conv+BiLSTM encoder (default)
            self.encoder = Encoder(dim)
        spk_dim = 0
        self.speaker_table = None
        if num_speakers > 1 and speaker_embedding_dim == 0:
            spk_dim = 64
            self.speaker_table = Embedding(num_speakers, spk_dim)
        elif speaker_embedding_dim:
            spk_dim = speaker_embedding_dim
        self.spk_proj = Dense(dim + spk_dim, dim) if spk_dim else None
        self.use_gst = use_gst
        if use_gst:
            from .gst import GST
            self.gst = GST(n_mels, dim, gst_cfg)
        self.duration = DurationPredictor(dim, cfg.duration_predictor_dim)
        self.energy = None
        if cfg.parallel_energy_predictor:
            self.energy = DurationPredictor(dim, cfg.duration_predictor_dim)
            self.energy_proj = Dense(1, dim)
        blocks = []
        for _ in range(cfg.parallel_decoder_blocks):
            blocks.append(ConvLNBlock(dim, dim, 5, dropout=0.1))
        self.decoder_blocks = blocks
        self.mel_head = Dense(dim, n_mels)
        self.postnet = Postnet(n_mels, cfg.postnet_dim)
        # API-compat shims used by generic serving glue
        self.r = 1

    def set_r(self, r: int) -> None:  # gradual-training no-op (parallel)
        self.r = 1

    # --- params --------------------------------------------------------------

    def init(self, key):
        # distinct subkeys for every submodule (advisor r4: speaker_table
        # and spk_proj previously shared one key → correlated init)
        ks = jax.random.split(key, 12)
        params = {
            "embedding": self.embedding.init(ks[0]),
            "encoder": self.encoder.init(ks[1]),
            "duration": self.duration.init(ks[2]),
            "decoder": [b.init(k) for b, k in zip(
                self.decoder_blocks, jax.random.split(ks[3],
                                                      len(self.decoder_blocks)))],
            "mel_head": self.mel_head.init(ks[4]),
            "postnet": self.postnet.init(ks[5]),
        }
        if self.embed_proj is not None:
            params["embed_proj"] = self.embed_proj.init(ks[6])
        if self.speaker_table is not None:
            params["speaker_table"] = self.speaker_table.init(ks[7])
        if self.spk_proj is not None:
            params["spk_proj"] = self.spk_proj.init(ks[8])
        if self.use_gst:
            params["gst"] = self.gst.init(ks[9])
        if self.energy is not None:
            params["energy"] = self.energy.init(ks[10])
            params["energy_proj"] = self.energy_proj.init(ks[11])
        state = {
            "encoder": self.encoder.init_state(),
            "postnet": self.postnet.init_state(),
        }
        if self.use_gst:
            state["gst"] = self.gst.init_state()
        return {"params": params, "state": state}

    # --- shared trunk --------------------------------------------------------

    def _encode(self, params, state, text, text_lengths, rng, train,
                speaker_ids, speaker_embeddings, style_mel=None,
                style_len=None):
        x = self.embedding(params["embedding"], text)
        if self.embed_proj is not None:
            x = self.embed_proj(params["embed_proj"], x)
        sub = None
        if rng is not None:
            rng, sub = jax.random.split(rng)
        enc, enc_state = self.encoder(params["encoder"], state["encoder"],
                                      x, text_lengths, sub, train)
        gst_state = state.get("gst", {}) if self.use_gst else {}
        if self.use_gst and style_mel is not None:
            # style ADDS before duration prediction, so a style reference
            # shifts prosody (durations) as well as spectral rendering
            style, gst_state = self.gst(params["gst"], state["gst"],
                                        style_mel, style_len, train)
            enc = enc + style[:, None, :]
        spk = None
        if self.speaker_table is not None and speaker_ids is not None:
            spk = self.speaker_table(params["speaker_table"], speaker_ids)
        elif speaker_embeddings is not None:
            spk = speaker_embeddings
        if spk is not None and self.spk_proj is not None:
            spk_b = jnp.broadcast_to(spk[:, None, :],
                                     enc.shape[:2] + (spk.shape[-1],))
            enc = self.spk_proj(params["spk_proj"],
                                jnp.concatenate([enc, spk_b], axis=-1))
        return enc, enc_state, gst_state, rng

    def _apply_energy(self, params, frames, frame_mask, energies, rng,
                      train):
        """FastSpeech2-style energy adaptor over length-regulated frames.
        Returns (conditioned frames, predicted per-frame energy or None)."""
        if self.energy is None:
            return frames, None
        sub = None
        if rng is not None:
            rng, sub = jax.random.split(rng)
        # the predictor must not steer the trunk (same rationale as the
        # duration predictor's stop-gradient)
        e_pred = self.energy(params["energy"],
                             jax.lax.stop_gradient(frames), frame_mask,
                             sub, train)
        e_cond = energies if energies is not None else e_pred
        e_cond = e_cond * frame_mask.astype(e_cond.dtype)
        frames = frames + self.energy_proj(params["energy_proj"],
                                           e_cond[..., None]) \
            * frame_mask[..., None].astype(frames.dtype)
        return frames, e_pred

    def _decode(self, params, state, frames, frame_mask, rng, train):
        x = frames
        for i, blk in enumerate(self.decoder_blocks):
            sub = None
            if rng is not None:
                rng, sub = jax.random.split(rng)
            y = blk(params["decoder"][i], x, sub, train, mask=frame_mask)
            x = (x + y) * frame_mask[..., None].astype(x.dtype)  # residual
        mel = self.mel_head(params["mel_head"], x)
        residual, post_state = self.postnet(params["postnet"],
                                            state["postnet"], mel, None,
                                            train=train)
        maskf = frame_mask[..., None].astype(mel.dtype)
        return mel * maskf, (mel + residual) * maskf, post_state

    # --- training ------------------------------------------------------------

    def forward(self, variables, text, text_lengths, durations, rng=None,
                train: bool = True, max_frames: int | None = None,
                speaker_ids=None, speaker_embeddings=None,
                return_alignments: bool = False, style_mel=None,
                style_len=None, energies=None):
        """Teacher-duration forward. durations [B, T_text] int32 frames per
        token (0 on pad tokens); max_frames is the static frame cap the
        caller trains against (the mel bucket length).

        `alignments` (the [B, M, T_text] one-hot frame→token map) is built
        only when return_alignments=True: at the benched B=384×400×128
        shape the one-hot is ~78 MB of HBM per step that the loss never
        reads (advisor r4). `frame_token_idx` + `frame_mask` are always
        returned and carry the same information compactly."""
        params, state = variables["params"], variables["state"]
        enc, enc_state, gst_state, rng = self._encode(
            params, state, text, text_lengths, rng, train, speaker_ids,
            speaker_embeddings, style_mel=style_mel, style_len=style_len)
        tok_mask = sequence_mask(text_lengths, text.shape[1])
        sub = None
        if rng is not None:
            rng, sub = jax.random.split(rng)
        # duration predictor trains against teacher durations; its gradient
        # must not steer the encoder (FastPitch-style stop-gradient)
        logd = self.duration(params["duration"],
                             jax.lax.stop_gradient(enc), tok_mask, sub,
                             train)
        if max_frames is None:
            if isinstance(jnp.asarray(durations), jax.core.Tracer):
                raise ValueError(
                    "ParallelTTS.forward: max_frames is required under "
                    "jit (the fallback reads a concrete duration sum); "
                    "pass the mel bucket length explicitly")
            M = int(durations.sum(axis=1).max())
        else:
            M = max_frames
        frames, frame_mask, idx, total = length_regulate(enc, durations, M)
        frames, e_pred = self._apply_energy(params, frames, frame_mask,
                                            energies, rng, train)
        mel, post, post_state = self._decode(
            params, state, frames, frame_mask, rng, train)
        new_state = {"encoder": enc_state, "postnet": post_state}
        if self.use_gst:
            new_state["gst"] = gst_state
        out = {
            "decoder_outputs": mel,
            "postnet_outputs": post,
            "log_durations": logd,
            "frame_mask": frame_mask,
            "frame_token_idx": idx,
            "mel_lengths": total,
            "state": new_state,
        }
        if e_pred is not None:
            out["energy_pred"] = e_pred
        if return_alignments:
            out["alignments"] = _pseudo_alignment(idx, frame_mask,
                                                  text.shape[1])
        return out

    # --- serving -------------------------------------------------------------

    def inference(self, variables, text, text_lengths, rng=None,
                  max_decoder_steps: int | None = None, speed: float = 1.0,
                  speaker_ids=None, speaker_embeddings=None, style_mel=None,
                  style_len=None, energy_scale: float = 1.0, **_compat):
        """Predicted-duration synthesis. max_decoder_steps is in FRAMES here
        (the parallel model has no r-groups); defaults to the config cap.
        speed > 1 shortens durations (faster speech). style_mel [B, T, n_mels]
        conditions a GST model on a reference utterance; energy_scale scales
        the predicted energy track (variance-adaptor models only)."""
        params, state = variables["params"], variables["state"]
        enc, _, _, rng = self._encode(params, state, text, text_lengths,
                                      None, False, speaker_ids,
                                      speaker_embeddings,
                                      style_mel=style_mel,
                                      style_len=style_len)
        tok_mask = sequence_mask(text_lengths, text.shape[1])
        logd = self.duration(params["duration"], enc, tok_mask, None, False)
        d = jnp.round((jnp.exp(logd) - 1.0) / speed)
        # every REAL token speaks for at least one frame: an early/undertrained
        # duration predictor must still produce non-degenerate audio (and a
        # zero-frame utterance downstream)
        d = jnp.maximum(d, 1.0) * tok_mask.astype(d.dtype)
        d = d.astype(jnp.int32)
        if max_decoder_steps is None:
            max_decoder_steps = self.cfg.max_decoder_steps * max(
                self.cfg.r, 1)
        M = max_decoder_steps
        frames, frame_mask, idx, total = length_regulate(enc, d, M)
        if self.energy is not None and energy_scale != 1.0:
            e_pred = self.energy(params["energy"], frames, frame_mask,
                                 None, False)
            frames, _ = self._apply_energy(params, frames, frame_mask,
                                           e_pred * energy_scale, None,
                                           False)
        else:
            frames, _ = self._apply_energy(params, frames, frame_mask,
                                           None, None, False)
        mel, post, _ = self._decode(params, state, frames, frame_mask,
                                    None, False)
        return {
            "decoder_outputs": mel.astype(jnp.float32),
            "postnet_outputs": post.astype(jnp.float32),
            "mel_lengths": total,
            "alignments": _pseudo_alignment(idx, frame_mask, text.shape[1]),
            "stop_probs": frame_mask.astype(jnp.float32) * 0.0,
            "durations": d,
        }


def _pseudo_alignment(idx, frame_mask, T_text: int):
    """One-hot frame→token map in the autoregressive models' alignment
    layout [B, frames, T_text] (keeps plotting/diagnostics/API uniform)."""
    oh = jax.nn.one_hot(idx, T_text, dtype=jnp.float32)
    return oh * frame_mask[..., None].astype(jnp.float32)


def frame_energy(mel, frame_mask):
    """Per-frame energy target for the variance adaptor: masked mean of the
    (normalized) target mel over channels — deterministic, scale-consistent
    with what the decoder itself regresses. mel [B, M, n_mels] -> [B, M]."""
    e = jnp.mean(mel, axis=-1)
    return e * frame_mask.astype(e.dtype)


class ParallelTTSLoss:
    """Masked L1 (decoder + postnet) + MSE on log(1 + duration); models
    with the energy adaptor add a masked MSE on the per-frame energy
    track (target = frame_energy(mel_target))."""

    def __init__(self, duration_alpha: float = 0.1,
                 energy_alpha: float = 0.1):
        self.duration_alpha = duration_alpha
        self.energy_alpha = energy_alpha

    def __call__(self, outputs, mel_target, durations, text_lengths):
        m = outputs["frame_mask"][..., None].astype(jnp.float32)
        denom = jnp.maximum(m.sum() * mel_target.shape[-1], 1.0)
        tgt = mel_target[:, : outputs["decoder_outputs"].shape[1]]
        l_dec = jnp.abs((outputs["decoder_outputs"] - tgt) * m).sum() / denom
        l_post = jnp.abs((outputs["postnet_outputs"] - tgt) * m).sum() / denom
        tok = sequence_mask(text_lengths, durations.shape[1]).astype(
            jnp.float32)
        logd_t = jnp.log1p(durations.astype(jnp.float32))
        l_dur = (((outputs["log_durations"] - logd_t) ** 2) * tok).sum() \
            / jnp.maximum(tok.sum(), 1.0)
        total = l_dec + l_post + self.duration_alpha * l_dur
        parts = {"loss_decoder": l_dec, "loss_postnet": l_post,
                 "loss_duration": l_dur}
        if "energy_pred" in outputs:
            fm = outputs["frame_mask"].astype(jnp.float32)
            e_t = frame_energy(tgt, outputs["frame_mask"])
            l_en = (((outputs["energy_pred"] - e_t) ** 2) * fm).sum() \
                / jnp.maximum(fm.sum(), 1.0)
            total = total + self.energy_alpha * l_en
            parts["loss_energy"] = l_en
        parts["loss"] = total
        return total, parts


def repair_row_durations(d, mel_len: int, T: int):
    """Repair one duration row (numpy int64 [<=T]) so its sum equals the
    loader's mel length: deficit is added to the last real token, excess is
    clipped off the tail tokens. Guards training against a stale/mismatched
    durations.npz silently teaching the decoder zero-padded mel frames
    (advisor r4 medium finding on bin/train_parallel.batch_durations)."""
    import numpy as np

    d = np.asarray(d, np.int64)[:T].copy()
    diff = int(mel_len) - int(d.sum())
    if diff > 0:  # deficit: extend the last real token
        nz = np.nonzero(d)[0]
        d[nz[-1] if len(nz) else 0] += diff
    elif diff < 0:  # excess: clip from the tail tokens
        excess = -diff
        for j in range(len(d) - 1, -1, -1):
            take = min(excess, int(d[j]))
            d[j] -= take
            excess -= take
            if excess == 0:
                break
    return d


def uniform_durations(text_lengths, mel_lengths, T_text: int):
    """Fallback teacher durations: spread each row's mel frames uniformly
    over its real tokens (remainder on the leading tokens). Exactly sums to
    mel_lengths; 0 on pad tokens. Good enough for smoke/e2e tests and as a
    bootstrap before `bin/extract_durations.py` alignments exist."""
    tl = text_lengths.astype(jnp.int32)
    ml = mel_lengths.astype(jnp.int32)
    base = ml // jnp.maximum(tl, 1)
    rem = ml - base * tl
    t = jnp.arange(T_text)[None, :]
    tok = t < tl[:, None]
    d = base[:, None] * tok + (t < rem[:, None])
    return d.astype(jnp.int32)
