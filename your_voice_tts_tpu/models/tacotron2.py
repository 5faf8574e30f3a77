"""Tacotron2: encoder-decoder with location-sensitive attention.

Architecture parity with the reference (layers/tacotron2.py + models/
tacotron2.py; SURVEY.md SS2.1): embedding(512) -> 3x[conv5-512+BN+ReLU+drop]
-> BiLSTM(256x2) -> autoregressive decoder (prenet 2x256 -> attention
LSTM 1024 -> location-sensitive attention -> decoder LSTM 1024 -> linear to
n_mels*r + stopnet) -> 5-conv postnet residual.

TPU-first rebuild of the hot path: the reference's per-step Python decoder
loop (its inner hot loop, SURVEY.md SS3.1) is ONE `lax.scan` over grouped
mel time — teacher-forced training and free-running inference are each a
single compiled XLA while-loop with static shapes. Inference uses per-sample
done-masking instead of data-dependent early exit (finished samples keep
computing but their outputs are masked; lengths are returned for host-side
trimming).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ..config import ModelConfig
from ..nn.core import Dense, Embedding, Params
from ..nn.rnn import LSTMCell, bilstm
from .attention import init_attn
from .common import (ConvBNBlock, Prenet, cast_compute, fold_bn_prenet,
                     outputs_f32, sequence_mask)


class Encoder:
    """3 conv blocks + BiLSTM (reference layers/tacotron2.py Encoder)."""

    def __init__(self, dim: int = 512):
        self.blocks = [ConvBNBlock(dim, dim, 5, "relu") for _ in range(3)]
        self.lstm_fwd = LSTMCell(dim, dim // 2)
        self.lstm_bwd = LSTMCell(dim, dim // 2)

    def init(self, key) -> Params:
        ks = jax.random.split(key, 5)
        return {
            "blocks": [b.init(k) for b, k in zip(self.blocks, ks[:3])],
            "lstm_fwd": self.lstm_fwd.init(ks[3]),
            "lstm_bwd": self.lstm_bwd.init(ks[4]),
        }

    def init_state(self) -> Params:
        return {"blocks": [b.init_state() for b in self.blocks]}

    def __call__(self, p: Params, state: Params, x, lengths, rng, train: bool):
        mask = sequence_mask(lengths, x.shape[1])
        new_blocks = []
        for i, blk in enumerate(self.blocks):
            sub = None
            if rng is not None:
                rng, sub = jax.random.split(rng)
            x, ns = blk(p["blocks"][i], state["blocks"][i], x, sub, train, mask=mask)
            new_blocks.append(ns)
        x = x * mask[..., None]
        out = bilstm(self.lstm_fwd, self.lstm_bwd, p["lstm_fwd"], p["lstm_bwd"],
                     x, lengths)
        return out, {"blocks": new_blocks}


class Postnet:
    """5 conv blocks refining the decoder output (reference Postnet)."""

    def __init__(self, n_mels: int, dim: int = 512, n_blocks: int = 5):
        self.blocks = [ConvBNBlock(n_mels, dim, 5, "tanh")]
        self.blocks += [ConvBNBlock(dim, dim, 5, "tanh") for _ in range(n_blocks - 2)]
        self.blocks += [ConvBNBlock(dim, n_mels, 5, None)]

    def init(self, key) -> Params:
        ks = jax.random.split(key, len(self.blocks))
        return {"blocks": [b.init(k) for b, k in zip(self.blocks, ks)]}

    def init_state(self) -> Params:
        return {"blocks": [b.init_state() for b in self.blocks]}

    def __call__(self, p: Params, state: Params, x, rng, train: bool, mask=None):
        new_blocks = []
        for i, blk in enumerate(self.blocks):
            sub = None
            if rng is not None:
                rng, sub = jax.random.split(rng)
            x, ns = blk(p["blocks"][i], state["blocks"][i], x, sub, train, mask=mask)
            new_blocks.append(ns)
        return x, {"blocks": new_blocks}


class Decoder:
    """Autoregressive decoder as a single `lax.scan` over grouped mel frames.

    Reference parity (layers/tacotron2.py Decoder): per step, the prenet'd
    last frame of the previous r-group + previous context feed the attention
    LSTM; its hidden queries attention; [hidden, context] feed the decoder
    LSTM; [decoder hidden, context] project to n_mels*r; [decoder hidden,
    projection] feed the stopnet (optionally gradient-isolated).
    """

    P_DROPOUT = 0.1  # attention/decoder RNN output dropout (reference value)

    def __init__(self, in_dim: int, n_mels: int, r_init: int, cfg: ModelConfig):
        """r_init is the LARGEST reduction factor the model will ever use
        (gradual training anneals r downward). Like the reference, the linear
        projection and stopnet are sized for r_init and the active r takes a
        prefix slice — so parameters are invariant across the r schedule."""
        self.in_dim = in_dim          # encoder output (+speaker) width
        self.n_mels = n_mels
        self.r_init = r_init
        self.cfg = cfg
        self.prenet = Prenet(n_mels, cfg.prenet_type, cfg.prenet_dropout,
                             (cfg.prenet_dim, cfg.prenet_dim))
        self.attention_rnn = LSTMCell(cfg.prenet_dim + in_dim, cfg.attention_rnn_dim)
        self.attention = init_attn(
            cfg.attention_type, cfg.attention_rnn_dim, in_dim, cfg.attention_dim,
            cfg.location_attn, cfg.attention_location_filters,
            cfg.attention_location_kernel_size, cfg.windowing, cfg.attention_norm,
            cfg.use_forward_attn, cfg.transition_agent, cfg.forward_attn_mask,
            cfg.attention_heads, cfg.win_back, cfg.win_front)
        self.decoder_rnn = LSTMCell(cfg.attention_rnn_dim + in_dim, cfg.decoder_rnn_dim)
        self.linear_projection = Dense(cfg.decoder_rnn_dim + in_dim, n_mels * r_init)
        self.stopnet = Dense(cfg.decoder_rnn_dim + n_mels * r_init, 1)

    def init(self, key) -> Params:
        ks = jax.random.split(key, 6)
        return {
            "prenet": self.prenet.init(ks[0]),
            "attention_rnn": self.attention_rnn.init(ks[1]),
            "attention": self.attention.init(ks[2]),
            "decoder_rnn": self.decoder_rnn.init(ks[3]),
            "projection": self.linear_projection.init(ks[4]),
            "stopnet": self.stopnet.init(ks[5]),
        }

    def init_state(self) -> Params:
        return {"prenet": self.prenet.init_state()}

    # fast_grad: route teacher forcing through the custom-VJP scan core
    # (models/decoder_grad.py). Instance-level escape hatch for tests/debug.
    fast_grad = True

    def fast_grad_supported(self) -> bool:
        from .attention import LocationSensitiveAttention
        a = self.attention
        return (self.fast_grad
                and isinstance(a, LocationSensitiveAttention)
                and not a.forward_attn and not a.trans_agent
                and a.norm in ("sigmoid", "softmax"))

    # --- one decode step (shared between teacher forcing and inference) -----

    def _step(self, p: Params, carry, prenet_out, inputs, processed_inputs,
              mask, train: bool, inference: bool = False):
        (attn_hc, dec_hc, attn_state, context, rng) = carry
        if rng is not None:
            rng, k1, k2 = jax.random.split(rng, 3)
        else:
            k1 = k2 = None

        attn_in = jnp.concatenate([prenet_out, context], axis=-1)
        attn_hc, attn_h = self.attention_rnn(p["attention_rnn"], attn_hc, attn_in)
        if train and k1 is not None:
            keep = 1.0 - self.P_DROPOUT
            attn_h = jnp.where(jax.random.bernoulli(k1, keep, attn_h.shape),
                               attn_h / keep, 0.0)

        attn_state, context, alignment = self.attention(
            p["attention"], attn_h, inputs, processed_inputs, attn_state,
            mask=mask, context_prev=context, inference=inference)
        # alignment math runs f32 even under bf16 inference; the context it
        # emits must rejoin the carry's compute dtype (scan carries are
        # dtype-invariant) and feed the decoder matmuls in bf16
        context = context.astype(attn_h.dtype)

        dec_in = jnp.concatenate([attn_h, context], axis=-1)
        dec_hc, dec_h = self.decoder_rnn(p["decoder_rnn"], dec_hc, dec_in)
        if train and k2 is not None:
            keep = 1.0 - self.P_DROPOUT
            dec_h = jnp.where(jax.random.bernoulli(k2, keep, dec_h.shape),
                              dec_h / keep, 0.0)

        proj_in = jnp.concatenate([dec_h, context], axis=-1)
        decoder_output = self.linear_projection(p["projection"], proj_in)

        # stopnet sees the FULL r_init-sized projection (reference decode():
        # stop computed before the active-r slice), keeping params r-invariant
        stop_in = jnp.concatenate([dec_h, decoder_output], axis=-1)
        if self.cfg.separate_stopnet:
            stop_in = lax.stop_gradient(stop_in)
        stop_logit = self.stopnet(p["stopnet"], stop_in)[..., 0]

        new_carry = (attn_hc, dec_hc, attn_state, context, rng)
        return new_carry, (decoder_output, alignment, stop_logit)

    def _init_carry(self, batch: int, max_time: int, rng, dtype=jnp.float32):
        return (
            self.attention_rnn.initial_state(batch, dtype),
            self.decoder_rnn.initial_state(batch, dtype),
            self.attention.init_state(batch, max_time),
            jnp.zeros((batch, self.in_dim), dtype),
            rng,
        )

    def forward(self, p: Params, state: Params, inputs, input_lengths, mels,
                rng, train: bool, r: int | None = None):
        """Teacher-forced decode.

        inputs: [B, T_in, in_dim] encoder memory; mels: [B, T_mel, n_mels]
        with T_mel % r == 0. Returns (outputs [B, T_mel, n_mels], alignments
        [B, T_r, T_in], stop_logits [B, T_r], new_state).
        """
        r = r or self.r_init
        B, T_mel, _ = mels.shape
        assert T_mel % r == 0, "mel length must be a multiple of r"
        T_r = T_mel // r
        mask = sequence_mask(input_lengths, inputs.shape[1])
        processed_inputs = self.attention.preprocess_inputs(p["attention"], inputs)

        # decoder inputs: go frame + last frame of each group but the last
        last_frames = mels[:, r - 1:: r, :]                      # [B, T_r, n_mels]
        go = jnp.zeros((B, 1, self.n_mels), mels.dtype)
        memories = jnp.concatenate([go, last_frames[:, :-1]], axis=1)

        if rng is not None:
            rng, k_pre, k_scan = jax.random.split(rng, 3)
        else:
            k_pre = k_scan = None
        prenet_out, prenet_state = self.prenet(p["prenet"], state["prenet"],
                                               memories, k_pre, train)

        if self.fast_grad_supported():
            # custom-VJP scan core: the backward pass carries no weight
            # gradients (see models/decoder_grad.py). Projection + stopnet
            # are hoisted out of the scan — under teacher forcing neither
            # feeds the recurrence, so whole-sequence matmuls are exact.
            from .decoder_grad import make_scan_core
            use_dropout = bool(train and k_scan is not None)
            core = make_scan_core(self, use_dropout)
            if k_scan is not None:
                keys = jax.random.split(k_scan, T_r)
            else:
                keys = jnp.zeros((T_r, 2), jnp.uint32)
            p_core = {"attention_rnn": p["attention_rnn"],
                      "decoder_rnn": p["decoder_rnn"],
                      "attention": p["attention"]}
            dech_t, ctx_t, aligns = core(
                p_core, jnp.swapaxes(prenet_out, 0, 1), inputs,
                processed_inputs, mask.astype(jnp.float32), keys)
            proj_in = jnp.concatenate([dech_t, ctx_t], axis=-1)
            dec_out = self.linear_projection(p["projection"], proj_in)
            stop_in = jnp.concatenate([dech_t, dec_out], axis=-1)
            if self.cfg.separate_stopnet:
                stop_in = lax.stop_gradient(stop_in)
            stops = self.stopnet(p["stopnet"], stop_in)[..., 0]    # [T_r, B]
        else:
            def step(carry, x_t):
                return self._step(p, carry, x_t, inputs, processed_inputs,
                                  mask, train)

            carry0 = self._init_carry(B, inputs.shape[1], k_scan, mels.dtype)
            _, (dec_out, aligns, stops) = lax.scan(
                step, carry0, jnp.swapaxes(prenet_out, 0, 1))
        dec_out = jnp.swapaxes(dec_out, 0, 1)         # [B, T_r, n_mels*r_init]
        outputs = dec_out[..., : self.n_mels * r].reshape(B, T_mel, self.n_mels)
        return outputs, jnp.swapaxes(aligns, 0, 1), jnp.swapaxes(stops, 0, 1), \
            {"prenet": prenet_state}

    def inference(self, p: Params, state: Params, inputs, input_lengths, rng,
                  max_steps: int, r: int | None = None):
        """Free-running decode to max_steps with per-sample stop masking.

        Returns (outputs [B, max_steps*r, n_mels], alignments, stop_probs,
        out_lengths [B] in mel frames).
        """
        r = r or self.r_init
        B = inputs.shape[0]
        carry0 = self.init_inference_carry(B, inputs, rng)
        carry, (dec_out, aligns, stops) = self.inference_scan(
            p, state, inputs, input_lengths, carry0, max_steps, r)
        steps_done = carry[3]
        dec_out = jnp.swapaxes(dec_out, 0, 1).reshape(B, max_steps * r, self.n_mels)
        return dec_out, jnp.swapaxes(aligns, 0, 1), jnp.swapaxes(stops, 0, 1), \
            steps_done * r

    def _attn_kernel_flags(self) -> dict:
        """Attention-variant flags forwarded to the Pallas decode kernel —
        the whole family is in-kernel (windowing / forward attention /
        transition agent for `original`; Graves GMM via its own branch)."""
        a = self.attention
        if self.cfg.attention_type == "graves":
            return {"graves": True, "attn_K": a.K}
        return {
            "windowing": a.windowing, "win_back": a.win_back,
            "win_front": a.win_front, "forward_attn": a.forward_attn,
            "trans_agent": a.trans_agent,
            "forward_attn_mask": a.forward_attn_mask,
            "loc_attn": a.location_attention,
        }

    def _pallas_prenet(self, p: Params, state: Params | None):
        from .common import pallas_prenet
        return pallas_prenet(self.prenet, self.cfg, p, state)

    def inference_pallas(self, p: Params, inputs, input_lengths, max_steps: int,
                         r: int | None = None, seed: int = 0,
                         interpret: bool = False, state: Params | None = None):
        """inference() on the weights-in-VMEM Pallas kernel
        (ops/pallas/taco2_decode.py) — the TPU serving fast path for the
        default attention configuration. Prenet dropout draws from the
        kernel's hash PRNG (seeded by `seed`) instead of jax.random, so
        outputs are reproducible but not bit-matched to the scan path when
        dropout is on. `state` (the decoder state pytree) is required only
        for BN prenets, whose running stats fold into the prenet weights."""
        from ..ops.pallas.taco2_decode import tacotron2_decode_pallas

        r = r or self.r_init
        B = inputs.shape[0]
        mask = sequence_mask(input_lengths, inputs.shape[1])
        processed_inputs = self.attention.preprocess_inputs(p["attention"], inputs)
        p, prenet_dropout = self._pallas_prenet(p, state)
        dec_out, aligns, stops, steps_done = tacotron2_decode_pallas(
            p, inputs, processed_inputs, mask, n_mels=self.n_mels, r=r,
            max_steps=max_steps, norm=getattr(self.attention, "norm", "sigmoid"),
            thresh=self.cfg.stop_threshold,
            prenet_dropout=prenet_dropout,
            seed=seed, interpret=interpret, **self._attn_kernel_flags())
        dec_out = jnp.swapaxes(dec_out[..., : self.n_mels * r], 0, 1) \
            .reshape(B, max_steps * r, self.n_mels)
        return dec_out, jnp.swapaxes(aligns, 0, 1), jnp.swapaxes(stops, 0, 1), \
            steps_done * r

    def inference_truncated_pallas(self, p: Params, inputs, input_lengths,
                                   max_steps: int, r: int | None = None,
                                   seed: int = 0, stream=None,
                                   interpret: bool = False,
                                   state: Params | None = None):
        """inference_truncated() on the weights-in-VMEM Pallas kernel: RNN
        hiddens + last frame stream across text chunks, attention resets per
        chunk, and the kernel's early exit stops decoding once every sample
        fires its stop token (the stream freezes there — see
        tacotron2_decode_pallas)."""
        from ..ops.pallas.taco2_decode import tacotron2_decode_pallas

        r = r or self.r_init
        B = inputs.shape[0]
        mask = sequence_mask(input_lengths, inputs.shape[1])
        processed_inputs = self.attention.preprocess_inputs(p["attention"], inputs)
        if stream is not None:
            attn_hc, dec_hc, prev_frame = stream
            stream = (tuple(attn_hc), tuple(dec_hc), prev_frame)
        p, prenet_dropout = self._pallas_prenet(p, state)
        dec_out, aligns, stops, steps_done, stream_out = tacotron2_decode_pallas(
            p, inputs, processed_inputs, mask, n_mels=self.n_mels, r=r,
            max_steps=max_steps, norm=getattr(self.attention, "norm", "sigmoid"),
            thresh=self.cfg.stop_threshold,
            prenet_dropout=prenet_dropout,
            seed=seed, interpret=interpret, stream=stream, return_stream=True,
            **self._attn_kernel_flags())
        dec_out = jnp.swapaxes(dec_out[..., : self.n_mels * r], 0, 1) \
            .reshape(B, max_steps * r, self.n_mels)
        (h1, c1), (h2, c2), frame = stream_out
        stream_out = ((h1, c1), (h2, c2), frame)
        return dec_out, jnp.swapaxes(aligns, 0, 1), jnp.swapaxes(stops, 0, 1), \
            steps_done * r, stream_out

    def init_inference_carry(self, B: int, inputs, rng, stream=None):
        """Fresh decode carry; if `stream` (attn_hc, dec_hc, prev_frame) from
        a previous text chunk is given, the RNN hiddens and last emitted
        frame persist while attention state and context reset for the new
        chunk (reference Decoder.inference_truncated `_init_states(...,
        keep_states=True)` semantics)."""
        inner4 = self._init_carry(B, inputs.shape[1], None, inputs.dtype)[:4]
        prev_frame = jnp.zeros((B, self.n_mels), inputs.dtype)
        if stream is not None:
            # cast to the current compute dtype: a stream saved from an f32
            # chunk may seed a bf16 decode (or vice versa)
            attn_hc, dec_hc, prev_frame = jax.tree_util.tree_map(
                lambda a: a.astype(inputs.dtype), tuple(stream))
            inner4 = (attn_hc, dec_hc) + inner4[2:]
        return (
            inner4,
            prev_frame,
            jnp.zeros((B,), bool),
            jnp.zeros((B,), jnp.int32),
            rng,
        )

    def inference_truncated(self, p: Params, state: Params, inputs,
                            input_lengths, rng, max_steps: int,
                            r: int | None = None, stream=None):
        """Streaming decode across text chunks with bounded memory (reference
        models/tacotron2.py inference_truncated): RNN hidden states and the
        last mel frame carry from chunk to chunk, so arbitrarily long text
        streams as a sequence of bounded decodes.

        Returns (outputs, alignments, stop_probs, out_lengths, stream') where
        stream' = (attn_hc, dec_hc, prev_frame) seeds the next chunk."""
        r = r or self.r_init
        B = inputs.shape[0]
        carry0 = self.init_inference_carry(B, inputs, rng, stream=stream)
        carry, (dec_out, aligns, stops) = self.inference_scan(
            p, state, inputs, input_lengths, carry0, max_steps, r)
        inner4, prev_frame = carry[0], carry[1]
        dec_out = jnp.swapaxes(dec_out, 0, 1).reshape(B, max_steps * r, self.n_mels)
        stream_out = (inner4[0], inner4[1], prev_frame)
        return dec_out, jnp.swapaxes(aligns, 0, 1), jnp.swapaxes(stops, 0, 1), \
            carry[3] * r, stream_out

    def inference_scan(self, p: Params, state: Params, inputs, input_lengths,
                       carry, n_steps: int, r: int):
        """Resumable decode: run `n_steps` from `carry`, return (carry, ys).

        Powers both one-shot inference and chunked early-exit decoding (host
        checks the carry's done mask between chunks and stops scanning once
        every sample has emitted its stop token).
        """
        mask = sequence_mask(input_lengths, inputs.shape[1])
        processed_inputs = self.attention.preprocess_inputs(p["attention"], inputs)
        thresh = self.cfg.stop_threshold

        def step(carry, _):
            inner4, prev_frame, done, steps_done, rng_ = carry
            if rng_ is not None:
                rng_, k_pre, k_step = jax.random.split(rng_, 3)
            else:
                k_pre = k_step = None
            prenet_out, _ = self.prenet(p["prenet"], state["prenet"],
                                        prev_frame, k_pre, train=False)
            tmp, (dec_out, align, stop_logit) = self._step(
                p, inner4 + (k_step,), prenet_out, inputs, processed_inputs,
                mask, train=False, inference=True)
            stop_prob = jax.nn.sigmoid(stop_logit)
            # mask outputs of finished samples; count steps while running
            active = jnp.logical_not(done)

            def _freeze(new, old):
                # finished rows keep their pre-stop state: the carry is the
                # resumable stream handed to inference_truncated's next
                # chunk, and letting it evolve on zeroed inputs post-stop
                # corrupts it (the Pallas route freezes at early exit too)
                return jax.tree_util.tree_map(
                    lambda n, o: jnp.where(
                        active.reshape((-1,) + (1,) * (n.ndim - 1)), n, o),
                    new, old)

            inner4 = _freeze(tmp[:4], inner4)
            dec_out = dec_out[:, : self.n_mels * r] * active[:, None].astype(dec_out.dtype)
            steps_done = steps_done + active.astype(jnp.int32)
            done = jnp.logical_or(done, stop_prob > thresh)
            new_frame = jnp.where(active[:, None],
                                  dec_out[:, self.n_mels * (r - 1):],
                                  prev_frame)  # last frame of group / frozen
            return (inner4, new_frame, done, steps_done, rng_), \
                (dec_out, align, stop_prob)

        return lax.scan(step, carry, None, length=n_steps)


class Tacotron2:
    """Full model (reference models/tacotron2.py + models/tacotron_abstract.py).

    Multi-speaker: an internal speaker-embedding table or external d-vectors
    (GE2E speaker encoder output), broadcast-concatenated to encoder outputs —
    the 'your voice' cloning path (SURVEY.md SS3.5).
    """

    output_type = "mel"  # postnet head emits mel frames (Griffin-Lim via pinv)

    def __init__(self, num_chars: int, cfg: ModelConfig, n_mels: int = 80,
                 num_speakers: int = 0, speaker_embedding_dim: int = 0,
                 use_gst: bool = False, gst_cfg=None, r_init: int | None = None):
        self.cfg = cfg
        self.n_mels = n_mels
        self.r = cfg.r                      # active reduction factor
        self.r_init = max(r_init or cfg.r, cfg.r)
        self.num_speakers = num_speakers
        self.use_external_speaker_embedding = num_speakers > 0 and speaker_embedding_dim > 0
        self.spk_dim = speaker_embedding_dim if num_speakers > 0 else 0
        if num_speakers > 0 and speaker_embedding_dim == 0:
            self.spk_dim = 512  # internal table default (reference abstract model)
        self.embedding = Embedding(num_chars, cfg.embedding_dim)
        self.encoder = Encoder(cfg.encoder_dim)
        dec_in = cfg.encoder_dim + self.spk_dim
        self.use_gst = use_gst
        if use_gst:
            from .gst import GST
            self.gst = GST(n_mels, cfg.encoder_dim, gst_cfg)
        self.decoder = Decoder(dec_in, n_mels, self.r_init, cfg)
        if cfg.bidirectional_decoder:
            # second decoder consuming the mel sequence in reverse; its output
            # regularizes the forward decoder (reference bidirectional_decoder)
            self.decoder_backward = Decoder(dec_in, n_mels, self.r_init, cfg)
        self.postnet = Postnet(n_mels, cfg.postnet_dim)
        if num_speakers > 0 and not self.use_external_speaker_embedding:
            self.speaker_embedding = Embedding(num_speakers, self.spk_dim)

    def init(self, key) -> dict[str, Params]:
        ks = jax.random.split(key, 7)
        params: Params = {
            "embedding": self.embedding.init(ks[0]),
            "encoder": self.encoder.init(ks[1]),
            "decoder": self.decoder.init(ks[2]),
            "postnet": self.postnet.init(ks[3]),
        }
        if self.cfg.bidirectional_decoder:
            params["decoder_backward"] = self.decoder_backward.init(ks[6])
        if self.num_speakers > 0 and not self.use_external_speaker_embedding:
            params["speaker_embedding"] = self.speaker_embedding.init(ks[4])
        if self.use_gst:
            params["gst"] = self.gst.init(ks[5])
        state = {
            "encoder": self.encoder.init_state(),
            "decoder": self.decoder.init_state(),
            "postnet": self.postnet.init_state(),
        }
        if self.cfg.bidirectional_decoder:
            state["decoder_backward"] = self.decoder_backward.init_state()
        if self.use_gst:
            state["gst"] = self.gst.init_state()
        return {"params": params, "state": state}

    def _condition(self, params, state, enc_out, speaker_ids=None,
                   speaker_embeddings=None, style_mel=None, style_len=None,
                   train: bool = False):
        """Attach speaker/style conditioning to encoder outputs. Returns
        (enc_out, gst_state) — gst_state is {} for non-GST models."""
        B, T = enc_out.shape[:2]
        gst_state = state.get("gst", {}) if self.use_gst else {}
        if self.use_gst and style_mel is None:
            import logging
            logging.getLogger(__name__).warning(
                "GST model conditioned WITHOUT a style reference: the GST "
                "branch is skipped and the decoder sees encoder outputs it "
                "never saw un-shifted in training — pass style_wav/style_mel")
        if self.use_gst and style_mel is not None:
            style, gst_state = self.gst(params["gst"], state["gst"],
                                        style_mel, style_len, train)  # [B, E]
            enc_out = enc_out + style[:, None, :]
        if self.num_speakers > 0:
            if self.use_external_speaker_embedding:
                spk = speaker_embeddings  # [B, spk_dim] d-vectors
            else:
                spk = self.speaker_embedding(params["speaker_embedding"], speaker_ids)
            spk = jnp.broadcast_to(spk[:, None, :], (B, T, self.spk_dim))
            enc_out = jnp.concatenate([enc_out, spk], axis=-1)
        return enc_out, gst_state

    def set_r(self, r: int) -> None:
        """Change the active reduction factor (gradual training; reference
        TacotronAbstract._set_r). Params are unaffected; jitted callers must
        re-trace (the trainer keys its compiled step on r)."""
        if r > self.r_init:
            raise ValueError(f"r={r} exceeds r_init={self.r_init}")
        self.r = r

    def forward(self, variables, text, text_lengths, mels, rng=None, train: bool = True,
                speaker_ids=None, speaker_embeddings=None, r: int | None = None,
                mel_lengths=None):
        """Teacher-forced pass. Returns dict with decoder/postnet outputs,
        alignments, stop logits, and updated BN state. When `mel_lengths` is
        given, the postnet's BatchNorm statistics exclude pad frames (the
        reference lets BN see padding; losses are masked either way)."""
        r = r or self.r
        params, state = variables["params"], variables["state"]
        if rng is not None:
            rng, k_enc, k_dec, k_post = jax.random.split(rng, 4)
        else:
            k_enc = k_dec = k_post = None
        x = self.embedding(params["embedding"], text)
        enc_out, enc_state = self.encoder(params["encoder"], state["encoder"],
                                          x, text_lengths, k_enc, train)
        enc_out, gst_state = self._condition(
            params, state, enc_out, speaker_ids, speaker_embeddings,
            style_mel=mels, style_len=mel_lengths, train=train)
        dec_out, aligns, stops, dec_state = self.decoder.forward(
            params["decoder"], state["decoder"], enc_out, text_lengths, mels,
            k_dec, train, r=r)
        mel_mask = None
        if mel_lengths is not None:
            mel_mask = sequence_mask(mel_lengths, dec_out.shape[1])
        residual, post_state = self.postnet(params["postnet"], state["postnet"],
                                            dec_out, k_post, train, mask=mel_mask)
        postnet_out = dec_out + residual
        out = {
            "decoder_outputs": dec_out,
            "postnet_outputs": postnet_out,
            "alignments": aligns,
            "stop_logits": stops,
            "state": {"encoder": enc_state, "decoder": dec_state, "postnet": post_state},
        }
        if self.use_gst:
            out["state"]["gst"] = gst_state
        if self.cfg.bidirectional_decoder and train:
            # run the backward decoder on time-reversed mels; flip its output
            # back so losses compare in forward time (reference
            # _backward_pass + DDC consistency term)
            mels_rev = jnp.flip(mels, axis=1)
            k_bwd = None
            if rng is not None:
                _, k_bwd = jax.random.split(rng)
            dec_b, aligns_b, _, bwd_state = self.decoder_backward.forward(
                params["decoder_backward"], state["decoder_backward"],
                enc_out, text_lengths, mels_rev, k_bwd, train, r=r)
            out["decoder_backward_outputs"] = jnp.flip(dec_b, axis=1)
            out["alignments_backward"] = aligns_b
            out["state"]["decoder_backward"] = bwd_state
        return out


    def _default_inference_rng(self, rng):
        """Reference parity: prenet dropout stays ON at inference (Tacotron2
        paper quirk). With rng=None we substitute a FIXED key so dropout is
        applied (deterministically); pass a real key for sampled masks, or
        set cfg.prenet_dropout=False for a truly dropout-free decode."""
        if rng is None and self.cfg.prenet_dropout:
            import jax as _jax
            return _jax.random.PRNGKey(0)
        return rng

    _cast_compute = staticmethod(cast_compute)
    _outputs_f32 = staticmethod(outputs_f32)

    def pallas_decode_supported(self, T: int, B: int = 1) -> bool:
        """True when inference() would auto-route the decode loop onto the
        weights-in-VMEM Pallas kernel for text length T and batch B (TPU
        backend, original-attention OR Graves configuration, and the full
        working set fits the DEVICE's VMEM per ops/pallas/capacity.py).
        There is no hard T cap: texts past MAX_T_BANDED serve on the
        constant-VMEM tiled location-attention formulation
        (taco2_decode._tile_matrices)."""
        from ..ops.pallas.capacity import taco2_kernel_fits
        from ..ops.pallas.taco2_decode import supported_config
        return (jax.default_backend() == "tpu" and supported_config(self.cfg)
                and taco2_kernel_fits(self.cfg, T=T, B=B,
                                      E=self.cfg.encoder_dim + self.spk_dim,
                                      r_init=self.r_init, n_mels=self.n_mels))

    def inference(self, variables, text, text_lengths, rng=None,
                  speaker_ids=None, speaker_embeddings=None, style_mel=None,
                  max_decoder_steps: int | None = None, r: int | None = None,
                  compute_dtype=None, use_pallas: bool | None = None,
                  pallas_seed: int = 0):
        """Free-running synthesis. Output lengths are in mel frames.

        compute_dtype=jnp.bfloat16 runs the encoder/decoder/postnet matmuls in
        bf16 (f32 alignments, f32 outputs) — the serving fast path.

        use_pallas=None auto-routes the decode loop onto the weights-in-VMEM
        Pallas kernel (ops/pallas/taco2_decode.py) on TPU when the attention
        configuration and text length support it (1.36x batch-1 latency over
        the bf16 XLA scan); True forces it, False forces the scan. The kernel
        draws prenet dropout from a counter-based hash PRNG seeded by
        `pallas_seed`, so `rng` does not perturb its outputs."""
        r = r or self.r
        rng = self._default_inference_rng(rng)
        params, state = variables["params"], variables["state"]
        params, state, speaker_embeddings, style_mel = self._cast_compute(
            params, state, compute_dtype, speaker_embeddings, style_mel)
        max_steps = max_decoder_steps or self.cfg.max_decoder_steps
        x = self.embedding(params["embedding"], text)
        enc_out, _ = self.encoder(params["encoder"], state["encoder"],
                                  x, text_lengths, None, train=False)
        enc_out, _ = self._condition(params, state, enc_out, speaker_ids,
                                     speaker_embeddings, style_mel=style_mel)
        if use_pallas is None:
            use_pallas = self.pallas_decode_supported(text.shape[1],
                                                      text.shape[0])
        if use_pallas:
            dec_out, aligns, stops, out_lengths = self.decoder.inference_pallas(
                params["decoder"], enc_out, text_lengths, max_steps, r=r,
                seed=pallas_seed, state=state["decoder"])
            if compute_dtype is not None:
                # the kernel emits f32 frames; the postnet params were cast
                # to the compute dtype — match them (scan path parity)
                dec_out = dec_out.astype(compute_dtype)
        else:
            dec_out, aligns, stops, out_lengths = self.decoder.inference(
                params["decoder"], state["decoder"], enc_out, text_lengths, rng,
                max_steps, r=r)
        residual, _ = self.postnet(params["postnet"], state["postnet"],
                                   dec_out, None, train=False)
        postnet_out = dec_out + residual
        return self._outputs_f32({
            "decoder_outputs": dec_out,
            "postnet_outputs": postnet_out,
            "alignments": aligns,
            "stop_probs": stops,
            "mel_lengths": out_lengths,
        })

    def inference_truncated(self, variables, text, text_lengths, rng=None,
                            speaker_ids=None, speaker_embeddings=None,
                            style_mel=None, max_decoder_steps: int | None = None,
                            r: int | None = None, stream_state=None,
                            compute_dtype=None, use_pallas: bool | None = None,
                            pallas_seed: int = 0):
        """Streaming synthesis over text CHUNKS with state carried between
        calls (reference Tacotron2.inference_truncated; SURVEY.md:96):
        decoder RNN hiddens + last mel frame persist across calls, attention
        restarts on each chunk's encoder memory. Feed successive pieces of a
        long text and concatenate the returned mels — memory stays bounded by
        the chunk length.

        Returns (outputs_dict, stream_state'); pass stream_state' to the next
        call. stream_state=None starts a fresh utterance. use_pallas routes
        onto the weights-in-VMEM decode kernel like inference() (None =
        auto on TPU; the kernel freezes the stream at its early exit)."""
        r = r or self.r
        rng = self._default_inference_rng(rng)
        params, state = variables["params"], variables["state"]
        params, state, speaker_embeddings, style_mel = self._cast_compute(
            params, state, compute_dtype, speaker_embeddings, style_mel)
        max_steps = max_decoder_steps or self.cfg.max_decoder_steps
        x = self.embedding(params["embedding"], text)
        enc_out, _ = self.encoder(params["encoder"], state["encoder"],
                                  x, text_lengths, None, train=False)
        enc_out, _ = self._condition(params, state, enc_out, speaker_ids,
                                     speaker_embeddings, style_mel=style_mel)
        if use_pallas is None:
            use_pallas = self.pallas_decode_supported(text.shape[1],
                                                      text.shape[0])
        if use_pallas:
            dec_out, aligns, stops, out_lengths, stream_out = \
                self.decoder.inference_truncated_pallas(
                    params["decoder"], enc_out, text_lengths, max_steps, r=r,
                    seed=pallas_seed, stream=stream_state,
                    state=state["decoder"])
            if compute_dtype is not None:
                # kernel emits f32 frames; postnet params are compute-dtype
                dec_out = dec_out.astype(compute_dtype)
        else:
            dec_out, aligns, stops, out_lengths, stream_out = \
                self.decoder.inference_truncated(
                    params["decoder"], state["decoder"], enc_out, text_lengths,
                    rng, max_steps, r=r, stream=stream_state)
        residual, _ = self.postnet(params["postnet"], state["postnet"],
                                   dec_out, None, train=False)
        return self._outputs_f32({
            "decoder_outputs": dec_out,
            "postnet_outputs": dec_out + residual,
            "alignments": aligns,
            "stop_probs": stops,
            "mel_lengths": out_lengths,
        }), stream_out

    def inference_incremental(self, variables, text, text_lengths, rng=None,
                              speaker_ids=None, speaker_embeddings=None,
                              style_mel=None, max_decoder_steps: int | None = None,
                              chunk_steps: int = 64, r: int | None = None,
                              compute_dtype=None):
        """Early-exit decoding: scan in jitted chunks and stop as soon as every
        sample has fired its stop token (host checks the done mask between
        chunks). Same outputs as inference(), but wall-clock scales with the
        ACTUAL utterance length instead of max_decoder_steps — the serving
        (p50 latency) path. Chunks reuse one compiled program.

        Note: each chunk is a separate dispatch; on a host-attached TPU that
        costs ~100us, so early exit wins whenever it saves >1 chunk of steps.
        (Over a remote-tunnel device where dispatch is ~100ms, prefer
        model.inference in one call.)"""
        r = r or self.r
        rng = self._default_inference_rng(rng)
        params, state = variables["params"], variables["state"]
        params, state, speaker_embeddings, style_mel = self._cast_compute(
            params, state, compute_dtype, speaker_embeddings, style_mel)
        max_steps = max_decoder_steps or self.cfg.max_decoder_steps

        if not hasattr(self, "_jit_fns"):
            self._jit_fns = {}
        enc_key = ("encode",)
        if enc_key not in self._jit_fns:
            def encode(params, state, text, text_lengths, speaker_ids,
                       speaker_embeddings, style_mel):
                x = self.embedding(params["embedding"], text)
                enc_out, _ = self.encoder(params["encoder"], state["encoder"],
                                          x, text_lengths, None, train=False)
                return self._condition(params, state, enc_out, speaker_ids,
                                       speaker_embeddings,
                                       style_mel=style_mel)[0]

            self._jit_fns[enc_key] = jax.jit(encode)
        enc_out = self._jit_fns[enc_key](params, state, text, text_lengths,
                                         speaker_ids, speaker_embeddings,
                                         style_mel)

        ck = ("chunk", r, chunk_steps)
        if ck not in self._jit_fns:
            def run_chunk(p_dec, s_dec, enc_out, text_lengths, carry):
                return self.decoder.inference_scan(p_dec, s_dec, enc_out,
                                                   text_lengths, carry,
                                                   chunk_steps, r)

            self._jit_fns[ck] = jax.jit(run_chunk)
        pk = ("postnet",)
        if pk not in self._jit_fns:
            def post(params, state, dec_out):
                res, _ = self.postnet(params["postnet"], state["postnet"],
                                      dec_out, None, train=False)
                return dec_out + res

            self._jit_fns[pk] = jax.jit(post)

        B = text.shape[0]
        carry = self.decoder.init_inference_carry(B, enc_out, rng)
        chunks = []
        steps = 0
        while steps < max_steps:
            carry, ys = self._jit_fns[ck](params["decoder"], state["decoder"],
                                          enc_out, text_lengths, carry)
            chunks.append(ys)
            steps += chunk_steps
            if bool(carry[2].all()):  # every sample emitted its stop token
                break
        dec_out = jnp.concatenate([c[0] for c in chunks], axis=0)   # [T_r, B, .]
        aligns = jnp.concatenate([c[1] for c in chunks], axis=0)
        stops = jnp.concatenate([c[2] for c in chunks], axis=0)
        T_r = dec_out.shape[0]
        dec_out = jnp.swapaxes(dec_out, 0, 1).reshape(B, T_r * r, self.n_mels)
        postnet_out = self._jit_fns[pk](params, state, dec_out)
        return self._outputs_f32({
            "decoder_outputs": dec_out,
            "postnet_outputs": postnet_out,
            "alignments": jnp.swapaxes(aligns, 0, 1),
            "stop_probs": jnp.swapaxes(stops, 0, 1),
            "mel_lengths": carry[3] * r,
        })
