"""Tacotron (v1): CBHG encoder, GRU decoder with memory queue, CBHG postnet
producing a LINEAR spectrogram (reference layers/tacotron.py + models/
tacotron.py; SURVEY.md SS2.1 "Tacotron(1) layers").

Structure: embedding(256) -> prenet -> CBHG (conv bank K=16 + maxpool +
projections + highway + BiGRU) -> attention GRU decoder emitting r mel
frames/step with a `memory_size`-frame input queue -> PostCBHG -> linear
spectrogram head (trained against the STFT magnitude target; Griffin-Lim
inverts it directly at inference).

Same TPU design as Tacotron2: both decoder modes are single `lax.scan`s;
the teacher-forced memory queue is precomputed as sliding windows (one
gather) instead of a per-step Python queue.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ..config import ModelConfig
from ..nn.core import BatchNorm1d, Conv1d, Dense, Embedding, Params
from ..nn.rnn import GRUCell, gru
from .attention import init_attn
from .common import (Prenet, cast_compute, fold_bn_prenet, outputs_f32,
                     sequence_mask)


class Highway:
    def __init__(self, dim: int):
        self.H = Dense(dim, dim, init_gain="relu")
        self.T = Dense(dim, dim, init_gain="sigmoid")

    def init(self, key) -> Params:
        k1, k2 = jax.random.split(key)
        p = {"H": self.H.init(k1), "T": self.T.init(k2)}
        p["T"]["b"] = jnp.full_like(p["T"]["b"], -1.0)  # bias toward carry
        return p

    def __call__(self, p: Params, x):
        h = jax.nn.relu(self.H(p["H"], x))
        t = jax.nn.sigmoid(self.T(p["T"], x))
        return h * t + x * (1.0 - t)


class CBHG:
    """Conv Bank + Highway + GRU (reference CBHG).

    conv bank of K kernel sizes (1..K) -> stack -> maxpool(2, stride 1) ->
    conv projections -> residual -> highway x4 -> BiGRU.
    """

    def __init__(self, in_dim: int, K: int = 16, bank_channels: int = 128,
                 projections: tuple[int, ...] = (128, 128),
                 highway_dim: int = 128, gru_dim: int = 128,
                 num_highways: int = 4):
        self.K = K
        self.bank = [Conv1d(in_dim, bank_channels, k, padding="same",
                            init_gain="relu") for k in range(1, K + 1)]
        self.bank_bn = BatchNorm1d(bank_channels * K)
        proj_dims = (bank_channels * K,) + tuple(projections)
        self.projs = [Conv1d(proj_dims[i], proj_dims[i + 1], 3, padding="same",
                             init_gain="relu" if i + 2 < len(proj_dims) else "linear")
                      for i in range(len(projections))]
        self.proj_bns = [BatchNorm1d(d) for d in projections]
        self.pre_highway = None
        if projections[-1] != highway_dim:
            self.pre_highway = Dense(projections[-1], highway_dim, use_bias=False)
        self.highways = [Highway(highway_dim) for _ in range(num_highways)]
        self.gru_fwd = GRUCell(highway_dim, gru_dim)
        self.gru_bwd = GRUCell(highway_dim, gru_dim)
        self.in_dim = in_dim
        self.out_dim = 2 * gru_dim

    def init(self, key) -> Params:
        n = len(self.bank) + len(self.projs) + len(self.highways) + 3
        ks = jax.random.split(key, n)
        i = 0
        p: Params = {"bank": []}
        for conv in self.bank:
            p["bank"].append(conv.init(ks[i])); i += 1
        p["bank_bn"] = self.bank_bn.init()
        p["projs"] = []
        for conv in self.projs:
            p["projs"].append(conv.init(ks[i])); i += 1
        p["proj_bns"] = [bn.init() for bn in self.proj_bns]
        if self.pre_highway is not None:
            p["pre_highway"] = self.pre_highway.init(ks[i]); i += 1
        p["highways"] = []
        for hw in self.highways:
            p["highways"].append(hw.init(ks[i])); i += 1
        p["gru_fwd"] = self.gru_fwd.init(ks[i]); i += 1
        p["gru_bwd"] = self.gru_bwd.init(ks[i])
        return p

    def init_state(self) -> Params:
        return {"bank_bn": self.bank_bn.init_state(),
                "proj_bns": [bn.init_state() for bn in self.proj_bns]}

    def __call__(self, p: Params, state: Params, x, train: bool, mask=None):
        # conv bank: K parallel convs, concat channels. mask: optional [B, T]
        # validity mask keeping pad frames out of the BN statistics
        bank_out = jnp.concatenate(
            [conv(cp, x) for conv, cp in zip(self.bank, p["bank"])], axis=-1)
        bank_out, bank_bn_state = self.bank_bn(p["bank_bn"], state["bank_bn"],
                                               bank_out, train, mask=mask)
        bank_out = jax.nn.relu(bank_out)
        # max pool width 2, stride 1, same length
        pooled = lax.reduce_window(bank_out, -jnp.inf, lax.max,
                                   (1, 2, 1), (1, 1, 1), "SAME")
        h = pooled
        proj_bn_states = []
        for i, (conv, bn) in enumerate(zip(self.projs, self.proj_bns)):
            h = conv(p["projs"][i], h)
            h, ns = bn(p["proj_bns"][i], state["proj_bns"][i], h, train,
                       mask=mask)
            proj_bn_states.append(ns)
            if i + 1 < len(self.projs):
                h = jax.nn.relu(h)
        h = h + x if h.shape[-1] == x.shape[-1] else h  # residual
        if self.pre_highway is not None:
            h = self.pre_highway(p["pre_highway"], h)
        for hw, hp in zip(self.highways, p["highways"]):
            h = hw(hp, h)
        out_f = gru(self.gru_fwd, p["gru_fwd"], h)
        out_b = gru(self.gru_bwd, p["gru_bwd"], h, reverse=True)
        out = jnp.concatenate([out_f, out_b], axis=-1)
        return out, {"bank_bn": bank_bn_state, "proj_bns": proj_bn_states}


class TacotronDecoder:
    """GRU decoder with memory queue (reference layers/tacotron.py Decoder)."""

    def __init__(self, in_dim: int, n_mels: int, r_init: int, memory_size: int,
                 cfg: ModelConfig):
        # reference hard-codes 256/128; cfg.tacotron_width scales the whole
        # stack (tests use tiny widths — compile time, not parity)
        w = cfg.tacotron_width
        h = w // 2
        self.in_dim = in_dim            # encoder output width (w)
        self.n_mels = n_mels
        self.r_init = r_init
        self.memory_size = memory_size if memory_size > 0 else r_init
        mem_dim = n_mels * self.memory_size
        self.prenet = Prenet(mem_dim, cfg.prenet_type, cfg.prenet_dropout,
                             (w, h))
        self.attention_rnn = GRUCell(h + in_dim, w)
        self.attention = init_attn(
            cfg.attention_type, w, in_dim, cfg.attention_dim,
            cfg.location_attn, cfg.attention_location_filters,
            cfg.attention_location_kernel_size, cfg.windowing,
            cfg.attention_norm, cfg.use_forward_attn, cfg.transition_agent,
            cfg.forward_attn_mask, cfg.attention_heads, cfg.win_back,
            cfg.win_front)
        self.project_to_decoder_in = Dense(w + in_dim, w)
        self.decoder_rnns = [GRUCell(w, w), GRUCell(w, w)]
        self.proj_to_mel = Dense(w, n_mels * r_init)
        self.stopnet = Dense(w + n_mels * r_init, 1)
        self.cfg = cfg

    def init(self, key) -> Params:
        ks = jax.random.split(key, 7 + len(self.decoder_rnns))
        return {
            "prenet": self.prenet.init(ks[0]),
            "attention_rnn": self.attention_rnn.init(ks[1]),
            "attention": self.attention.init(ks[2]),
            "project": self.project_to_decoder_in.init(ks[3]),
            "decoder_rnns": [c.init(k) for c, k in
                             zip(self.decoder_rnns, ks[4:4 + len(self.decoder_rnns)])],
            "proj_mel": self.proj_to_mel.init(ks[-2]),
            "stopnet": self.stopnet.init(ks[-1]),
        }

    def init_state(self) -> Params:
        return {"prenet": self.prenet.init_state()}

    def _step(self, p, carry, prenet_out, inputs, processed_inputs, mask,
              inference=False):
        attn_h, dec_hs, attn_state, context = carry
        attn_h, _ = self.attention_rnn(
            p["attention_rnn"], attn_h,
            jnp.concatenate([prenet_out, context], axis=-1))
        attn_state, context, alignment = self.attention(
            p["attention"], attn_h, inputs, processed_inputs, attn_state,
            mask=mask, context_prev=context, inference=inference)
        # f32 alignment math emits an f32 context; rejoin the carry's compute
        # dtype (scan carries are dtype-invariant; bf16 inference path)
        context = context.astype(attn_h.dtype)
        x = self.project_to_decoder_in(
            p["project"], jnp.concatenate([attn_h, context], axis=-1))
        new_dec_hs = []
        for cell, cp, h in zip(self.decoder_rnns, p["decoder_rnns"], dec_hs):
            h, o = cell(cp, h, x)
            x = x + o  # residual GRUs (reference)
            new_dec_hs.append(h)
        output = self.proj_to_mel(p["proj_mel"], x)
        stop_in = jnp.concatenate([x, output], axis=-1)
        if self.cfg.separate_stopnet:
            stop_in = lax.stop_gradient(stop_in)
        stop_logit = self.stopnet(p["stopnet"], stop_in)[..., 0]
        return (attn_h, tuple(new_dec_hs), attn_state, context), \
            (output, alignment, stop_logit)

    def _init_carry(self, B, T_in, dtype=jnp.float32):
        return (
            self.attention_rnn.initial_state(B, dtype),
            tuple(c.initial_state(B, dtype) for c in self.decoder_rnns),
            self.attention.init_state(B, T_in),
            jnp.zeros((B, self.in_dim), dtype),
        )

    def forward(self, p, state, inputs, input_lengths, mels, rng, train,
                r: int | None = None):
        r = r or self.r_init
        B, T_mel, _ = mels.shape
        T_r = T_mel // r
        M = self.memory_size
        mask = sequence_mask(input_lengths, inputs.shape[1])
        processed = self.attention.preprocess_inputs(p["attention"], inputs)
        # teacher-forced memory queues: before step t the queue holds ground-
        # truth frames [t*r - M, t*r) (zero-padded at the start) -> one gather
        padded = jnp.pad(mels, ((0, 0), (M, 0), (0, 0)))
        idx = (jnp.arange(T_r) * r)[:, None] + jnp.arange(M)[None, :]  # [T_r, M]
        queues = padded[:, idx].reshape(B, T_r, M * self.n_mels)
        if rng is not None:
            rng, k_pre = jax.random.split(rng)
        else:
            k_pre = None
        prenet_out, prenet_state = self.prenet(p["prenet"], state["prenet"],
                                               queues, k_pre, train)

        def step(carry, x_t):
            return self._step(p, carry, x_t, inputs, processed, mask)

        _, (outs, aligns, stops) = lax.scan(
            step, self._init_carry(B, inputs.shape[1], mels.dtype),
            jnp.swapaxes(prenet_out, 0, 1))
        outs = jnp.swapaxes(outs, 0, 1)[..., : self.n_mels * r]
        return outs.reshape(B, T_mel, self.n_mels), \
            jnp.swapaxes(aligns, 0, 1), jnp.swapaxes(stops, 0, 1), \
            {"prenet": prenet_state}

    def inference_pallas(self, p, inputs, input_lengths, max_steps,
                         r: int | None = None, seed: int = 0,
                         interpret: bool = False, state=None):
        """inference() on the weights-in-VMEM Pallas kernel
        (ops/pallas/taco1_decode.py) — same contract as the scan path; the
        kernel's hash PRNG drives prenet dropout (seeded by `seed`). `state`
        (decoder state pytree) is required only for BN prenets, whose
        running-stats affine folds into the prenet Linears
        (models/common.fold_bn_prenet) with dropout off."""
        from ..ops.pallas.taco1_decode import tacotron1_decode_pallas

        r = r or self.r_init
        B = inputs.shape[0]
        mask = sequence_mask(input_lengths, inputs.shape[1])
        processed = self.attention.preprocess_inputs(p["attention"], inputs)
        from .common import pallas_prenet
        p, prenet_dropout = pallas_prenet(self.prenet, self.cfg, p, state)
        out, aligns, stops, steps_done = tacotron1_decode_pallas(
            p, inputs, processed, mask, n_mels=self.n_mels, r=r,
            memory_size=self.memory_size, max_steps=max_steps,
            norm=self.attention.norm, thresh=self.cfg.stop_threshold,
            prenet_dropout=prenet_dropout,
            seed=seed, interpret=interpret)
        out = jnp.swapaxes(out[..., : self.n_mels * r], 0, 1) \
            .reshape(B, max_steps * r, self.n_mels)
        return out, jnp.swapaxes(aligns, 0, 1), jnp.swapaxes(stops, 0, 1), \
            steps_done * r

    def inference(self, p, state, inputs, input_lengths, rng, max_steps,
                  r: int | None = None):
        r = r or self.r_init
        B = inputs.shape[0]
        M = self.memory_size
        mask = sequence_mask(input_lengths, inputs.shape[1])
        processed = self.attention.preprocess_inputs(p["attention"], inputs)
        thresh = self.cfg.stop_threshold

        def step(carry, _):
            inner, queue, done, steps_done, rng_ = carry
            if rng_ is not None:
                rng_, k_pre = jax.random.split(rng_)
            else:
                k_pre = None
            prenet_out, _ = self.prenet(p["prenet"], state["prenet"],
                                        queue.reshape(B, M * self.n_mels),
                                        k_pre, train=False)
            inner, (out, align, stop_logit) = self._step(
                p, inner, prenet_out, inputs, processed, mask, inference=True)
            stop_prob = jax.nn.sigmoid(stop_logit)
            active = jnp.logical_not(done)
            out_r = out[:, : self.n_mels * r] * active[:, None].astype(out.dtype)
            steps_done = steps_done + active.astype(jnp.int32)
            done = jnp.logical_or(done, stop_prob > thresh)
            frames = out_r.reshape(B, r, self.n_mels)
            queue = jnp.concatenate([queue, frames], axis=1)[:, -M:]
            return (inner, queue, done, steps_done, rng_), (out_r, align, stop_prob)

        carry0 = (self._init_carry(B, inputs.shape[1], inputs.dtype),
                  jnp.zeros((B, M, self.n_mels), inputs.dtype),
                  jnp.zeros((B,), bool), jnp.zeros((B,), jnp.int32), rng)
        (_, _, _, steps_done, _), (outs, aligns, stops) = lax.scan(
            step, carry0, None, length=max_steps)
        outs = jnp.swapaxes(outs, 0, 1).reshape(B, max_steps * r, self.n_mels)
        return outs, jnp.swapaxes(aligns, 0, 1), jnp.swapaxes(stops, 0, 1), \
            steps_done * r


class Tacotron:
    """Full Tacotron1: mel decoder + PostCBHG linear-spectrogram head."""

    output_type = "linear"  # postnet head emits the linear spectrogram

    def __init__(self, num_chars: int, cfg: ModelConfig, n_mels: int = 80,
                 num_freq: int = 513, num_speakers: int = 0,
                 speaker_embedding_dim: int = 0, use_gst: bool = False,
                 gst_cfg=None, r_init: int | None = None):
        self.cfg = cfg
        self.n_mels = n_mels
        self.num_freq = num_freq
        self.r = cfg.r
        self.r_init = max(r_init or cfg.r, cfg.r)
        self.num_speakers = num_speakers
        self.use_external_speaker_embedding = num_speakers > 0 and speaker_embedding_dim > 0
        self.spk_dim = speaker_embedding_dim if num_speakers > 0 else 0
        w = cfg.tacotron_width
        h = w // 2
        if num_speakers > 0 and speaker_embedding_dim == 0:
            self.spk_dim = w
        self.embedding = Embedding(num_chars, w)
        self.enc_prenet = Prenet(w, cfg.prenet_type, cfg.prenet_dropout, (w, h))
        self.encoder_cbhg = CBHG(h, bank_channels=h, projections=(h, h),
                                 highway_dim=h, gru_dim=h)
        enc_out = self.encoder_cbhg.out_dim + self.spk_dim
        self.use_gst = use_gst
        if use_gst:
            from .gst import GST
            self.gst = GST(n_mels, self.encoder_cbhg.out_dim, gst_cfg)
        self.decoder = TacotronDecoder(enc_out, n_mels, self.r_init,
                                       cfg.memory_size, cfg)
        self.post_cbhg = CBHG(n_mels, K=8, projections=(w, n_mels),
                              highway_dim=h, gru_dim=h)
        self.last_linear = Dense(self.post_cbhg.out_dim, num_freq)
        if num_speakers > 0 and not self.use_external_speaker_embedding:
            self.speaker_embedding = Embedding(num_speakers, self.spk_dim)

    def set_r(self, r: int) -> None:
        if r > self.r_init:
            raise ValueError(f"r={r} exceeds r_init={self.r_init}")
        self.r = r

    def init(self, key) -> dict:
        ks = jax.random.split(key, 8)
        params: Params = {
            "embedding": self.embedding.init(ks[0]),
            "enc_prenet": self.enc_prenet.init(ks[1]),
            "encoder_cbhg": self.encoder_cbhg.init(ks[2]),
            "decoder": self.decoder.init(ks[3]),
            "post_cbhg": self.post_cbhg.init(ks[4]),
            "last_linear": self.last_linear.init(ks[5]),
        }
        if self.num_speakers > 0 and not self.use_external_speaker_embedding:
            params["speaker_embedding"] = self.speaker_embedding.init(ks[6])
        if self.use_gst:
            params["gst"] = self.gst.init(ks[7])
        state = {
            "enc_prenet": self.enc_prenet.init_state(),
            "encoder_cbhg": self.encoder_cbhg.init_state(),
            "decoder": self.decoder.init_state(),
            "post_cbhg": self.post_cbhg.init_state(),
        }
        if self.use_gst:
            state["gst"] = self.gst.init_state()
        return {"params": params, "state": state}

    def _encode(self, params, state, text, rng, train, speaker_ids,
                speaker_embeddings, style_mel, style_len=None):
        x = self.embedding(params["embedding"], text)
        x, pre_state = self.enc_prenet(params["enc_prenet"], state["enc_prenet"],
                                       x, rng, train)
        enc_out, cbhg_state = self.encoder_cbhg(params["encoder_cbhg"],
                                                state["encoder_cbhg"], x, train)
        gst_state = state.get("gst", {}) if self.use_gst else {}
        if self.use_gst and style_mel is None:
            import logging
            logging.getLogger(__name__).warning(
                "GST model conditioned WITHOUT a style reference: the GST "
                "branch is skipped — pass style_wav/style_mel")
        if self.use_gst and style_mel is not None:
            style, gst_state = self.gst(params["gst"], state["gst"],
                                        style_mel, style_len=style_len,
                                        train=train)
            enc_out = enc_out + style[:, None, :]
        if self.num_speakers > 0:
            B, T = enc_out.shape[:2]
            if self.use_external_speaker_embedding:
                spk = speaker_embeddings
            else:
                spk = self.speaker_embedding(params["speaker_embedding"], speaker_ids)
            enc_out = jnp.concatenate(
                [enc_out, jnp.broadcast_to(spk[:, None, :], (B, T, self.spk_dim))],
                axis=-1)
        return enc_out, pre_state, cbhg_state, gst_state

    def forward(self, variables, text, text_lengths, mels, rng=None,
                train: bool = True, speaker_ids=None, speaker_embeddings=None,
                r: int | None = None, mel_lengths=None):
        r = r or self.r
        params, state = variables["params"], variables["state"]
        if rng is not None:
            rng, k_enc, k_dec = jax.random.split(rng, 3)
        else:
            k_enc = k_dec = None
        enc_out, pre_state, cbhg_state, gst_state = self._encode(
            params, state, text, k_enc, train, speaker_ids, speaker_embeddings,
            style_mel=mels, style_len=mel_lengths)
        dec_out, aligns, stops, dec_state = self.decoder.forward(
            params["decoder"], state["decoder"], enc_out, text_lengths, mels,
            k_dec, train, r=r)
        # pad frames excluded from PostCBHG BN statistics when lengths given
        mel_mask = (sequence_mask(mel_lengths, dec_out.shape[1])
                    if mel_lengths is not None else None)
        post, post_state = self.post_cbhg(params["post_cbhg"],
                                          state["post_cbhg"], dec_out, train,
                                          mask=mel_mask)
        linear = self.last_linear(params["last_linear"], post)
        return {
            "decoder_outputs": dec_out,
            "postnet_outputs": linear,      # LINEAR spectrogram [B, T, num_freq]
            "alignments": aligns,
            "stop_logits": stops,
            "state": ({"enc_prenet": pre_state, "encoder_cbhg": cbhg_state,
                       "decoder": dec_state, "post_cbhg": post_state}
                      | ({"gst": gst_state} if self.use_gst else {})),
        }

    def pallas_decode_supported(self, T: int, B: int = 1) -> bool:
        """True when inference() would auto-route onto the weights-in-VMEM
        Pallas kernel (TPU, default attention config, queue rolls by whole
        steps, and the working set fits the DEVICE's VMEM per
        ops/pallas/capacity.py). There is no hard T cap: texts past
        MAX_T_BANDED serve on the constant-VMEM tiled formulation."""
        from ..ops.pallas.capacity import taco1_kernel_fits
        from ..ops.pallas.taco1_decode import taco1_supported
        return (jax.default_backend() == "tpu"
                and taco1_supported(self.cfg, self.decoder.memory_size, self.r)
                and taco1_kernel_fits(
                    self.cfg, T=T, B=B,
                    E=self.encoder_cbhg.out_dim + self.spk_dim,
                    r_init=self.r_init, memory_size=self.decoder.memory_size,
                    n_mels=self.n_mels))

    def inference(self, variables, text, text_lengths, rng=None,
                  speaker_ids=None, speaker_embeddings=None, style_mel=None,
                  max_decoder_steps: int | None = None, r: int | None = None,
                  compute_dtype=None, use_pallas: bool | None = None,
                  pallas_seed: int = 0):
        r = r or self.r
        if rng is None and self.cfg.prenet_dropout:
            # prenet dropout stays ON at inference (reference quirk); with no
            # key we substitute a fixed one so it applies deterministically
            rng = jax.random.PRNGKey(0)
        params, state = variables["params"], variables["state"]
        params, state, speaker_embeddings, style_mel = cast_compute(
            params, state, compute_dtype, speaker_embeddings, style_mel)
        max_steps = max_decoder_steps or self.cfg.max_decoder_steps
        enc_out, _, _, _ = self._encode(params, state, text, rng, False,
                                     speaker_ids, speaker_embeddings, style_mel)
        if use_pallas is None:
            use_pallas = self.pallas_decode_supported(text.shape[1],
                                                      text.shape[0])
        if use_pallas:
            dec_out, aligns, stops, out_lengths = self.decoder.inference_pallas(
                params["decoder"], enc_out, text_lengths, max_steps, r=r,
                seed=pallas_seed, state=state["decoder"])
            if compute_dtype is not None:
                # the kernel emits f32 frames; the PostCBHG params were cast
                # to the compute dtype — match them (scan path parity)
                dec_out = dec_out.astype(compute_dtype)
        else:
            dec_out, aligns, stops, out_lengths = self.decoder.inference(
                params["decoder"], state["decoder"], enc_out, text_lengths, rng,
                max_steps, r=r)
        post, _ = self.post_cbhg(params["post_cbhg"], state["post_cbhg"],
                                 dec_out, False)
        linear = self.last_linear(params["last_linear"], post)
        return outputs_f32({
            "decoder_outputs": dec_out,
            "postnet_outputs": linear,
            "alignments": aligns,
            "stop_probs": stops,
            "mel_lengths": out_lengths,
        })
