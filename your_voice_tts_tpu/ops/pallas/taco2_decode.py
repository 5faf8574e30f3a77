"""Tacotron2 autoregressive decode as a weights-in-VMEM Pallas TPU kernel.

The decoder scan is the framework's serving hot loop (reference models/
tacotron2.py Decoder.inference — its per-step Python loop; SURVEY.md SS3.1).
Under XLA (`lax.scan`), every step re-reads the ~37 MB (bf16) of decoder
weights from HBM: at batch 1 the whole decode is weight-bandwidth burn
(500 steps x 37 MB ~= 18 GB of HBM reads ~= 23 ms at v5e bandwidth — which
is the measured decode time).

This kernel keeps ALL decoder weights resident in VMEM for the entire
utterance, exactly like ops/pallas/wavernn_gen.py:

- grid = (n_chunks,): TPU Pallas grids run sequentially, so VMEM scratch
  (LSTM hiddens, attention state, context, previous frame, done mask)
  persists across grid steps — the grid IS the decode loop, chunked.
- weights + encoder memory use constant index_maps: DMA'd into VMEM once.
- the location-sensitive attention's 31-tap conv over [prev_align,
  cum_align] is folded with the location dense into one banded matrix
  K_loc [2T, T*A] (built once at trace time), so the in-kernel step is a
  single MXU matmul `[att ; cum] @ K_loc -> [B, T*A] -> [B, T, A]`.
  (A shifted-slice formulation of the same contraction crashes the Mosaic
  compiler; the band matrix costs O(T^2 A) VMEM, capping that formulation
  at MAX_T_BANDED.) Texts beyond the cap auto-route onto the TILED
  formulation (_tile_matrices): the band is shift-invariant, so one
  [2*384, 128*A] matrix — constant VMEM in T — serves every 128-wide
  output tile against a halo-padded input slab, and energies accumulate
  tile by tile without ever materializing [B, T, A].
- prenet dropout (always-on, the reference quirk) draws from the same
  counter-based hash PRNG as the WaveRNN kernel — deterministic per
  (seed, step), chunk-invariant, and functional under interpret mode.

Covers the FULL attention family: location-sensitive (sigmoid or softmax
norm) with in-kernel windowing, forward attention, transition agent and
forward mask, plus Graves GMM attention (mixture parameters from one
section-packed matmul, per-component unrolled VPU math, means in VMEM
scratch). Only non-original prenets fall back to the XLA scan
(models/tacotron2.py supported_config).

Perf note (measured, v5e): the step costs ~112 us regardless of which op is
ablated — the bound is the serial latency of the ~10-op dependency chain,
not FLOPs, bandwidth, or loop overhead (full-unrolling the chunk loop
measured SLOWER, 32.6 vs 30.7 ms/250 steps, at 50x the compile time).
Don't retry unrolling; gains here need a shorter chain, not cheaper ops.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .capacity import MAX_T_BANDED, kernel_vmem_limit  # noqa: F401 (re-export)
from .wavernn_gen import _fmix32, _uniform

F32 = jnp.float32
BF16 = jnp.bfloat16


def _lstm(xs, h, c, wxs, wh, b, dtype):
    """Fused LSTM cell, torch gate order (i, f, g, o) — nn/rnn.py parity.
    xs/wxs are matching tuples: the caller's input CONCAT is replaced by
    row-split weight matmuls summed into the gates. Separate matmuls on
    purpose: row-stacking into one [x|h] @ W pass was measured SLOWER
    (min 29.6 vs 26.8 ms / 500-step batch-1 decode, v5e) — an in-kernel
    concatenate is a VMEM copy on the serial chain that costs more than a
    saved matmul+add at these tiny shapes; the same holds for the
    [prenet|ctx] and [h|ctx] inputs, whose weights are split at trace time
    (free) instead."""
    gates = (jnp.dot(h.astype(dtype), wh[...], preferred_element_type=F32)
             + b[...])
    for x, wx in zip(xs, wxs):
        gates = gates + jnp.dot(x.astype(dtype), wx[...],
                                preferred_element_type=F32)
    H = h.shape[-1]
    i = jax.nn.sigmoid(gates[..., :H])
    f = jax.nn.sigmoid(gates[..., H:2 * H])
    g = jnp.tanh(gates[..., 2 * H:3 * H])
    o = jax.nn.sigmoid(gates[..., 3 * H:])
    c = f * c + i * g
    h = o * jnp.tanh(c)
    return h, c


def _kernel(seed_ref, inputs_ref, pinp_ref, maskadd_ref,
            p1_w, p1_b, p2_w, p2_b,
            a_wx_x, a_wx_c, a_wh, a_b, q_w, k_loc, v_w, v_b,
            d_wx_h, d_wx_c, d_wh, d_b,
            proj_w_h, proj_w_c, proj_b, stop_w_h, stop_w_c, stop_b,
            shift_w, ta_w_c, ta_w_h, ta_b, gl1_w, gl1_b, g3_w, g3_b,
            h1_0, c1_0, h2_0, c2_0, frame_0,
            out_ref, align_ref, stop_ref,
            h1_out, c1_out, h2_out, c2_out, frame_out,
            h1_ref, c1_ref, h2_ref, c2_ref, ctx_ref, att_ref, cum_ref,
            frame_ref, done_ref, alpha_ref, win_ref, mu_ref,
            *, chunk: int, n_mels: int, r: int, norm: str,
            thresh: float, prenet_dropout: bool, dtype,
            windowing: bool, win_back: int, win_front: int,
            forward_attn: bool, trans_agent: bool, forward_attn_mask: bool,
            graves: bool, n_gmm: int, loc_tiled: bool, loc_attn: bool = True):
    step0 = pl.program_id(0) == 0
    # tiled location attention stores alignments at offset LOC_HALO inside
    # halo-padded [B, T + 2*LOC_HALO] att/cum scratch (see _tile_matrices)
    OFF = LOC_HALO if loc_tiled else 0

    @pl.when(step0)
    def _():
        # RNN hiddens + previous frame seed from the caller (zeros for a
        # fresh decode; a previous chunk's stream for inference_truncated);
        # attention state and context always start fresh, matching the
        # reference's _init_states(keep_states=True)
        h1_ref[...] = h1_0[...]
        c1_ref[...] = c1_0[...]
        h2_ref[...] = h2_0[...]
        c2_ref[...] = c2_0[...]
        frame_ref[...] = frame_0[...]
        ctx_ref[...] = jnp.zeros_like(ctx_ref)
        att_ref[...] = jnp.zeros_like(att_ref)
        cum_ref[...] = jnp.zeros_like(cum_ref)
        done_ref[...] = jnp.zeros_like(done_ref)
        # forward attention: alpha starts as the one-hot [1, 0, 0, ...]
        # (attention.init_state); windowing: window center starts at 0.
        # NOTE: tpu.iota only produces integers — build in i32, cast after
        alpha_ref[...] = (lax.broadcasted_iota(
            jnp.int32, alpha_ref.shape, 1) == 0).astype(F32)
        win_ref[...] = jnp.zeros_like(win_ref)
        # Graves GMM means start at 0 (attention.init_state mu=zeros)
        mu_ref[...] = jnp.zeros_like(mu_ref)

    seed = seed_ref[0]
    chunk_base = pl.program_id(0) * np.int32(chunk)
    B, T = maskadd_ref.shape
    # early exit: once every sample has fired its stop token, later chunks
    # skip the decode entirely and just zero their output blocks (outputs are
    # uninitialized VMEM otherwise) — latency tracks the LONGEST utterance in
    # the batch, not max_steps
    all_done = jnp.sum(1.0 - done_ref[...]) == 0.0

    @pl.when(all_done)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)
        align_ref[...] = jnp.zeros_like(align_ref)
        stop_ref[...] = jnp.zeros_like(stop_ref)

    def _post_attention(t, align, ctx, h1, c1):
        """Decoder LSTM + projections + state writes — shared by the
        location-sensitive and Graves attention branches."""
        # --- decoder LSTM + projections --------------------------------------
        # all [a|b] input concats are gone: weights are row-split at trace
        # time and each part matmuls separately (concat = VMEM copy on the
        # serial chain; see _lstm docstring)
        h2, c2 = _lstm((h1, ctx), h2_ref[...], c2_ref[...],
                       (d_wx_h, d_wx_c), d_wh, d_b, dtype)
        dec_out = (jnp.dot(h2.astype(dtype), proj_w_h[...],
                           preferred_element_type=F32)
                   + jnp.dot(ctx.astype(dtype), proj_w_c[...],
                             preferred_element_type=F32) + proj_b[...])
        # stopnet folded through the projection at trace time (wrapper):
        # stop([h2, dec_out]) becomes matmuls on (h2, ctx), off the
        # dec_out-dependent tail of the serial chain
        stop_logit = (jnp.dot(h2.astype(dtype), stop_w_h[...],
                              preferred_element_type=F32)
                      + jnp.dot(ctx.astype(dtype), stop_w_c[...],
                                preferred_element_type=F32) + stop_b[...])
        stop_prob = jax.nn.sigmoid(stop_logit[:, 0])           # [B]

        # --- stop masking (inference_scan semantics) --------------------------
        active = 1.0 - done_ref[...][:, 0]                     # [B]
        dec_out = dec_out * active[:, None]
        done = jnp.maximum(done_ref[...][:, 0],
                           (stop_prob > thresh).astype(F32))
        new_frame = dec_out[:, n_mels * (r - 1): n_mels * r]

        h1_ref[...] = h1
        c1_ref[...] = c1
        h2_ref[...] = h2
        c2_ref[...] = c2
        ctx_ref[...] = ctx
        att_ref[:, OFF:OFF + T] = align
        cum_ref[:, OFF:OFF + T] = cum_ref[:, OFF:OFF + T] + align
        frame_ref[...] = new_frame
        done_ref[...] = done[:, None]
        out_ref[t] = dec_out
        align_ref[t] = align
        stop_ref[t] = stop_prob[:, None]
        return 0

    def body(t, _):
        key = _fmix32(seed + (chunk_base + t) * np.int32(-1640531527))
        # the banded location matmul depends only on the PREVIOUS step's
        # alignments — issue it before the prenet so its MXU latency overlaps
        # the prenet+attention-LSTM chain instead of serializing after it
        # (the tiled formulation interleaves with pq and stays in place)
        f_proj_early = None
        if not graves and not loc_tiled and loc_attn:
            ac0 = jnp.concatenate([att_ref[...], cum_ref[...]], axis=-1)
            f_proj_early = jnp.dot(ac0.astype(dtype), k_loc[...],
                                   preferred_element_type=F32)  # [B, T*A]
        # --- prenet (dropout always on when enabled; reference quirk) -------
        x = frame_ref[...]                                     # [B, n_mels]
        x = jax.nn.relu(jnp.dot(x.astype(dtype), p1_w[...],
                                preferred_element_type=F32) + p1_b[...])
        if prenet_dropout:
            x = jnp.where(_uniform(x.shape, key, 11) < 0.5, 0.0, x * 2.0)
        x = jax.nn.relu(jnp.dot(x.astype(dtype), p2_w[...],
                                preferred_element_type=F32) + p2_b[...])
        if prenet_dropout:
            x = jnp.where(_uniform(x.shape, key, 12) < 0.5, 0.0, x * 2.0)

        # --- attention LSTM --------------------------------------------------
        h1, c1 = _lstm((x, ctx_ref[...]), h1_ref[...], c1_ref[...],
                       (a_wx_x, a_wx_c), a_wh, a_b, dtype)

        t_lane = lax.broadcasted_iota(jnp.int32, (B, T), 1).astype(F32)
        if graves:
            # --- Graves GMM attention (models/attention.py GravesAttention):
            # gbk = l2(tanh(l1(h1))) -> (g, b, k) per mixture component;
            # sig = softplus(b)+eps, mu += softplus(k), g = softmax(g)+eps;
            # align = 1/sqrt(2pi) * sum_j g_j exp(-((mu_j - t)/sig_j)^2 / 2).
            # The K components live in lane-padded [B, 128] sections of one
            # [B, 384] matmul output; per-component scalars are extracted by
            # masked lane reductions (static K, unrolled at trace time).
            qg = jnp.tanh(jnp.dot(h1.astype(dtype), gl1_w[...],
                                  preferred_element_type=F32) + gl1_b[...])
            gbk = jnp.dot(qg.astype(dtype), g3_w[...],
                          preferred_element_type=F32) + g3_b[...]  # [B, 384]
            g_sec = gbk[:, 0:128]
            b_sec = gbk[:, 128:256]
            k_sec = gbk[:, 256:384]
            lane = lax.broadcasted_iota(jnp.int32, (B, 128), 1)
            valid = lane < n_gmm
            gm = jnp.max(jnp.where(valid, g_sec, -1e30), axis=-1,
                         keepdims=True)
            ge = jnp.where(valid, jnp.exp(g_sec - gm), 0.0)
            gw = ge / jnp.sum(ge, axis=-1, keepdims=True) + 1e-5
            sig = jax.nn.softplus(b_sec) + 1e-5
            mu = mu_ref[...] + jax.nn.softplus(k_sec)
            mu_ref[...] = mu
            align = jnp.zeros((B, T), F32)
            for j in range(n_gmm):
                sel = (lane == j).astype(F32)
                g_j = jnp.sum(gw * sel, axis=-1, keepdims=True)    # [B, 1]
                s_j = jnp.sum(sig * sel, axis=-1, keepdims=True)
                m_j = jnp.sum(mu * sel, axis=-1, keepdims=True)
                z = (m_j - t_lane) / s_j
                align = align + g_j * jnp.exp(-0.5 * z * z)
            align = np.float32(0.3989422917366028) * align
            align = jnp.where(maskadd_ref[...] >= -0.5, align, 0.0)
            align = align / jnp.maximum(
                jnp.sum(align, axis=-1, keepdims=True), 1e-8)
            ctx = jnp.sum(align[:, :, None] * inputs_ref[...], axis=1)
            return _post_attention(t, align, ctx, h1, c1)

        # --- location-sensitive attention ------------------------------------
        # energies = v . tanh(Wq h1 + U [att; cum]_conv + Wk m); the conv +
        # location dense are pre-folded into one banded K_loc [2T, T*A] (a
        # single MXU matmul on [att ; cum]) or, past MAX_T_BANDED, into the
        # shift-invariant tile matrix (_tile_matrices) applied per 128-wide
        # output tile — constant VMEM in T
        pq = jnp.dot(h1.astype(dtype), q_w[...],
                     preferred_element_type=F32)               # [B, A]
        A = pq.shape[-1]
        if loc_tiled:
            e_parts = []
            for i in range(T // LOC_TILE):
                a_slab = att_ref[:, i * LOC_TILE: i * LOC_TILE + LOC_TILE
                                 + 2 * LOC_HALO]
                c_slab = cum_ref[:, i * LOC_TILE: i * LOC_TILE + LOC_TILE
                                 + 2 * LOC_HALO]
                ac = jnp.concatenate([a_slab, c_slab], axis=-1)  # [B, 768]
                f_t = jnp.dot(ac.astype(dtype), k_loc[...],
                              preferred_element_type=F32)      # [B, 128*A]
                f_t = f_t.reshape(B, LOC_TILE, A)
                th = jnp.tanh(pq[:, None, :] + f_t
                              + pinp_ref[:, i * LOC_TILE:(i + 1) * LOC_TILE, :])
                e_parts.append(jnp.sum(th * v_w[...][None, None, :], axis=-1))
            e = (jnp.concatenate(e_parts, axis=-1) if len(e_parts) > 1
                 else e_parts[0]) + v_b[...]
        elif loc_attn:
            f_proj = f_proj_early.reshape(B, T, A)             # hoisted above
            tanh_arg = jnp.tanh(pq[:, None, :] + f_proj + pinp_ref[...])
            e = (jnp.sum(tanh_arg * v_w[...][None, None, :], axis=-1)
                 + v_b[...])
        else:
            # plain content-based energies (location_attn=False): no
            # location term at all — v . tanh(Wq h1 + Wk m)
            tanh_arg = jnp.tanh(pq[:, None, :] + pinp_ref[...])
            e = (jnp.sum(tanh_arg * v_w[...][None, None, :], axis=-1)
                 + v_b[...])
        e = e + maskadd_ref[...]                               # -1e9 at pads
        if windowing:
            # energies outside [win_idx - back, win_idx + front] are dropped
            # (models/attention.py _apply_windowing; kernel = inference only)
            lo = win_ref[...] - np.float32(win_back)           # [B, 1]
            hi = win_ref[...] + np.float32(win_front)
            inside = (t_lane >= lo) & (t_lane <= hi)
            e = jnp.where(inside, e, -1e9)
        if norm == "softmax":
            align = jax.nn.softmax(e, axis=-1)
        else:  # sigmoid norm (reference default)
            s = jax.nn.sigmoid(e)
            align = s / jnp.maximum(jnp.sum(s, axis=-1, keepdims=True), 1e-8)
        if forward_attn:
            # alpha recursion (models/attention.py _forward_attention); the
            # right-shift is an MXU matmul against the superdiagonal matrix
            alpha_prev = alpha_ref[...]
            alpha_shift = jnp.dot(alpha_prev.astype(dtype), shift_w[...],
                                  preferred_element_type=F32)
            if trans_agent:
                u = jax.nn.sigmoid(
                    jnp.dot(ctx_ref[...].astype(dtype), ta_w_c[...],
                            preferred_element_type=F32)
                    + jnp.dot(h1.astype(dtype), ta_w_h[...],
                              preferred_element_type=F32)
                    + ta_b[...])                               # [B, 1]
            else:
                u = 0.5
            alpha = ((1.0 - u) * alpha_prev + u * alpha_shift + 1e-8) * align
            if forward_attn_mask:
                # zero alpha more than 1 step behind the (first) max
                maxv = jnp.max(alpha, axis=-1, keepdims=True)
                first_max = jnp.min(
                    jnp.where(alpha >= maxv, t_lane, np.float32(T)),
                    axis=-1, keepdims=True)
                alpha = jnp.where(t_lane >= first_max - 1.0, alpha, 0.0)
                alpha = alpha + 1e-8
            alpha = jnp.where(maskadd_ref[...] >= -0.5, alpha, 0.0)
            alpha = alpha / jnp.maximum(jnp.sum(alpha, axis=-1, keepdims=True),
                                        1e-8)
            align = alpha
            alpha_ref[...] = alpha
        if windowing:
            maxa = jnp.max(align, axis=-1, keepdims=True)
            win_ref[...] = jnp.min(
                jnp.where(align >= maxa, t_lane, np.float32(T)),
                axis=-1, keepdims=True)
        ctx = jnp.sum(align[:, :, None] * inputs_ref[...], axis=1)  # [B, E]
        return _post_attention(t, align, ctx, h1, c1)

    @pl.when(jnp.logical_not(all_done))
    def _():
        lax.fori_loop(0, chunk, body, 0)
        # final-state outputs (constant index map: last executed chunk wins;
        # skipped post-done chunks leave them frozen) — the stream a
        # truncated/streaming decode carries into its next text chunk
        h1_out[...] = h1_ref[...]
        c1_out[...] = c1_ref[...]
        h2_out[...] = h2_ref[...]
        c2_out[...] = c2_ref[...]
        frame_out[...] = frame_ref[...]


# The banded location matrices cost 2 * T^2 * A bytes of VMEM in bf16
# (T=256, A=128: 2x16 MB); MAX_T_BANDED (ops/pallas/capacity.py) caps that
# formulation. Beyond it the wrapper auto-routes onto the TILED formulation
# below — constant VMEM in T — so long texts stay on the kernel fast path.
LOC_TILE = 128   # output positions served per tile matmul (one lane block)
LOC_HALO = 128   # input halo per side; covers conv pad (K-1)/2 up to 128


def supported_config(cfg) -> bool:
    """The kernel covers the full attention family: every
    `attention_type="original"` configuration (location-sensitive energies
    with optional windowing, forward attention, transition agent, forward
    mask, sigmoid or softmax norm) AND Graves GMM attention (per-component
    unrolled VPU math, means carried in VMEM scratch). Both prenet types are
    served: "original" directly, "bn" by folding the inference-mode BatchNorm
    affine into the prenet Linears at trace time
    (models/common.fold_bn_prenet) — no config falls back on prenet grounds."""
    if cfg.prenet_type not in ("original", "bn"):
        return False
    if cfg.attention_type == "graves":
        return True
    # location_attn=False (plain content-based energies) is served too: the
    # kernel simply skips the banded/tiled location matmul (loc_attn flag)
    return (cfg.attention_type == "original"
            and cfg.attention_norm in ("sigmoid", "softmax"))


def _band_matrices(wconv, wdense, T: int, dtype):
    """Fold the location conv [K, 2, F] and location dense [F, A] into one
    banded matrix K_loc [2T, T*A] (K_att stacked on K_cum), where
    K_att[s, t*A + a] = (wconv[:, 0] @ wdense)[s - t + pad, a] (0 outside the
    band), so that f_proj = [att ; cum] @ K_loc equals the scan path's
    conv1d(pad=SAME) -> dense location features. `wdense` must already be
    lane-padded to the kernel's A (multiple of 128)."""
    loc_K = wconv.shape[0]
    pad = (loc_K - 1) // 2
    u = jnp.einsum("kcf,fa->cka", wconv, wdense)               # [2, K, A]
    s_ix = jnp.arange(T)[:, None]
    t_ix = jnp.arange(T)[None, :]
    k = s_ix - t_ix + pad                                      # [T, T]
    valid = (k >= 0) & (k < loc_K)
    kc = jnp.clip(k, 0, loc_K - 1)
    k_att = jnp.where(valid[:, :, None], u[0][kc], 0.0)        # [T, T, A]
    k_cum = jnp.where(valid[:, :, None], u[1][kc], 0.0)
    # stack into one [2T, T*A] operand: the in-kernel step multiplies the
    # concatenated [att ; cum] row vector against it in a single MXU pass
    return jnp.concatenate([k_att.reshape(T, -1),
                            k_cum.reshape(T, -1)], axis=0).astype(dtype)


def _tile_matrices(wconv, wdense, dtype):
    """Shift-invariant tile fold of the location conv + dense. The conv band
    only ever reaches (K-1)/2 <= LOC_HALO positions past an output tile, so
    ONE [2*(LOC_TILE + 2*LOC_HALO), LOC_TILE*A] matrix serves EVERY 128-wide
    output tile [i*128, (i+1)*128) against the 384-lane input slab
    [i*128 - 128, i*128 + 256) of the halo-padded att/cum scratch (the
    alignment vector lives at offset LOC_HALO in a [B, T + 2*LOC_HALO]
    buffer, so every slab slice is 128-lane aligned and in bounds). VMEM
    cost is constant in T — this is what lifts the decode kernel past
    MAX_T_BANDED — at the price of T/128 smaller matmuls per step instead
    of one."""
    loc_K = wconv.shape[0]
    pad = (loc_K - 1) // 2
    if pad > LOC_HALO:
        raise ValueError(f"location kernel pad {pad} exceeds halo {LOC_HALO}")
    S = LOC_TILE + 2 * LOC_HALO
    u = jnp.einsum("kcf,fa->cka", wconv, wdense)               # [2, K, A]
    # slab position s holds absolute input index i*128 - LOC_HALO + s for
    # tile i; output position tt is absolute t = i*128 + tt, so the conv tap
    # is k = input - (t - pad) = s - tt - LOC_HALO + pad for every tile alike
    s_ix = jnp.arange(S)[:, None]
    t_ix = jnp.arange(LOC_TILE)[None, :]
    k = s_ix - t_ix - LOC_HALO + pad                           # [S, LOC_TILE]
    valid = (k >= 0) & (k < loc_K)
    kc = jnp.clip(k, 0, loc_K - 1)
    k_att = jnp.where(valid[:, :, None], u[0][kc], 0.0)        # [S, 128, A]
    k_cum = jnp.where(valid[:, :, None], u[1][kc], 0.0)
    return jnp.concatenate([k_att.reshape(S, -1),
                            k_cum.reshape(S, -1)], axis=0).astype(dtype)


def tacotron2_decode_pallas(p_dec: dict, enc_out, processed_inputs, mask,
                            *, n_mels: int, r: int, max_steps: int,
                            norm: str = "sigmoid", thresh: float = 0.6,
                            prenet_dropout: bool = True, seed: int = 0,
                            chunk: int = 50, interpret: bool = False,
                            dtype=BF16, stream=None, return_stream=False,
                            windowing: bool = False, win_back: int = 1,
                            win_front: int = 3, forward_attn: bool = False,
                            trans_agent: bool = False,
                            forward_attn_mask: bool = False,
                            graves: bool = False, attn_K: int = 4,
                            loc_tiled: bool | None = None,
                            loc_attn: bool = True):
    """Free-running Tacotron2 decode, whole loop in one kernel launch.

    p_dec: Decoder param pytree (models/tacotron2.py layout). enc_out
    [B, T, E] conditioned encoder memory; processed_inputs [B, T, A] = W_k m;
    mask [B, T] bool. Returns (dec_out [steps, B, n_mels*r_init], alignments
    [steps, B, T], stop_probs [steps, B], lengths [B] in r-groups) matching
    Decoder.inference_scan's stacked outputs (time-major).

    stream: optional ((h1, c1), (h2, c2), prev_frame) from a previous text
    chunk — RNN hiddens and the last emitted frame seed this decode while
    attention state resets (reference inference_truncated keep_states
    semantics). return_stream appends the final such tuple to the return
    value. NOTE: after every sample has stopped, the kernel's early exit
    freezes the stream at the all-done chunk boundary (the XLA scan keeps
    evolving state on zeroed frames to max_steps — frozen-at-done is the
    more meaningful stream, but the two paths only match bit-for-bit while
    no stop token has fired).

    loc_tiled: None auto-selects the location-attention formulation — the
    single banded matmul for T <= MAX_T_BANDED, the constant-VMEM tiled
    formulation (_tile_matrices) beyond it; True/False force it. Tiled pads
    T up to a 128 multiple internally (alignments are sliced back).
    """
    B0, T, E = enc_out.shape
    if graves and processed_inputs is None:
        # Graves attention has no precomputed key projection; the kernel's
        # pinp_ref is never read in that branch — ship a minimal dummy block
        processed_inputs = jnp.zeros((B0, 8, 128), F32)
    # Mosaic rejects batch-1 (sub-sublane) operands; pad the batch to a
    # multiple of 8 — MXU matmuls process >=8 sublane rows per pass anyway,
    # so the padding is free. Padded rows get mask=False everywhere: their
    # energies are -1e9, alignments collapse to exact 0, and outputs are
    # sliced away below.
    B = ((B0 + 7) // 8) * 8
    if B != B0:
        padb = ((0, B - B0),)
        enc_out = jnp.pad(enc_out, padb + ((0, 0), (0, 0)))
        processed_inputs = jnp.pad(processed_inputs, padb + ((0, 0), (0, 0)))
        mask = jnp.pad(mask, padb + ((0, 0),))
    if loc_tiled is None:
        loc_tiled = (not graves) and loc_attn and T > MAX_T_BANDED
    loc_tiled = bool(loc_tiled) and not graves and loc_attn
    T0 = T
    if loc_tiled:
        # tile formulation operates on whole 128-lane output tiles; padded
        # positions get mask=False -> -1e9 energies -> exact-0 alignments
        Tp = ((T + LOC_TILE - 1) // LOC_TILE) * LOC_TILE
        if Tp != T:
            enc_out = jnp.pad(enc_out, ((0, 0), (0, Tp - T), (0, 0)))
            processed_inputs = jnp.pad(processed_inputs,
                                       ((0, 0), (0, Tp - T), (0, 0)))
            mask = jnp.pad(mask, ((0, 0), (0, Tp - T)))
            T = Tp
    H1 = p_dec["attention_rnn"]["wh"].shape[0]
    H2 = p_dec["decoder_rnn"]["wh"].shape[0]
    if stream is None:
        state0 = [jnp.zeros((B, H1), F32), jnp.zeros((B, H1), F32),
                  jnp.zeros((B, H2), F32), jnp.zeros((B, H2), F32),
                  jnp.zeros((B, n_mels), F32)]
    else:
        (h1s, c1s), (h2s, c2s), fr = stream
        state0 = [jnp.pad(jnp.asarray(s, F32), ((0, B - B0), (0, 0)))
                  if B != B0 else jnp.asarray(s, F32)
                  for s in (h1s, c1s, h2s, c2s, fr)]
    n_steps = ((max_steps + chunk - 1) // chunk) * chunk
    n_chunks = n_steps // chunk

    if not graves and loc_attn and not loc_tiled and T > MAX_T_BANDED:
        raise ValueError(
            f"banded location attention serves T <= {MAX_T_BANDED} "
            f"(got {T}); use loc_tiled=True (the auto-route default) or "
            f"the XLA scan path for longer inputs")
    if graves:
        # no banded location matrices and no key projection — the Graves
        # branch only needs l1 [Q, Q] and the section-packed l2 [Q, 384]
        # (g | b | k mixture parameters in lane-padded 128-column sections)
        q_w = jnp.zeros((8, 128), F32)
        v_w = jnp.zeros((128,), F32)
        k_loc = jnp.zeros((8, 128), dtype)
        w2 = p_dec["attention"]["l2"]["w"]                     # [Q, 3K]
        b2 = p_dec["attention"]["l2"]["b"]
        K = attn_K
        Qd = w2.shape[0]
        g3_w = jnp.zeros((Qd, 384), F32)
        g3_b = jnp.zeros((384,), F32)
        for sec in range(3):
            g3_w = g3_w.at[:, 128 * sec: 128 * sec + K].set(
                w2[:, K * sec: K * (sec + 1)])
            g3_b = g3_b.at[128 * sec: 128 * sec + K].set(
                b2[K * sec: K * (sec + 1)])
        gl1_w = p_dec["attention"]["l1"]["w"]
        gl1_b = p_dec["attention"]["l1"]["b"]
    else:
        # Mosaic only supports the in-kernel [B, T*A] -> [B, T, A] shape cast
        # when A is a full lane multiple; pad the attention dim to 128 with
        # zero columns (q_w/loc_dense/pinp/v all padded -> the extra energies
        # contribute tanh(0) * 0 = 0, exactly nothing)
        q_w = p_dec["attention"]["query"]["w"]
        v_w = p_dec["attention"]["v"]["w"][:, 0]
        wdense = (p_dec["attention"]["loc_dense"]["w"] if loc_attn
                  else jnp.zeros((8, q_w.shape[1]), F32))      # [F, A]
        A0 = q_w.shape[1]
        A = ((A0 + 127) // 128) * 128
        if A != A0:
            padA = ((0, 0), (0, A - A0))
            q_w = jnp.pad(q_w, padA)
            wdense = jnp.pad(wdense, padA)
            v_w = jnp.pad(v_w, ((0, A - A0),))
            processed_inputs = jnp.pad(processed_inputs,
                                       ((0, 0), (0, 0), (0, A - A0)))
        if not loc_attn:
            # plain content-based attention: no location matrices at all
            # (and no T cap from the band — the kernel never reads k_loc)
            k_loc = jnp.zeros((8, 128), dtype)
        else:
            k_loc = (_tile_matrices(p_dec["attention"]["loc_conv"]["w"],
                                    wdense, dtype) if loc_tiled
                     else _band_matrices(
                         p_dec["attention"]["loc_conv"]["w"],  # [K, 2, F]
                         wdense, T, dtype))
        gl1_w = jnp.zeros((8, 128), F32)
        gl1_b = jnp.zeros((128,), F32)
        g3_w = jnp.zeros((8, 384), F32)
        g3_b = jnp.zeros((384,), F32)

    v_b = (jnp.zeros((1,), F32) if graves
           else p_dec["attention"]["v"]["b"])
    # forward-attention right-shift as a superdiagonal matrix (alpha @ S
    # shifts alpha one position toward larger t); transition-agent dense.
    # Both are tiny and always passed — unused branches are compiled away.
    shift_w = jnp.eye(8, k=1) if graves else jnp.eye(T, k=1)
    H1d = p_dec["attention_rnn"]["wh"].shape[0]
    if trans_agent:
        ta_w = p_dec["attention"]["ta"]["w"]                   # [E + Q, 1]
        ta_b = p_dec["attention"]["ta"]["b"]
    else:
        ta_w = jnp.zeros((E + H1d, 1), F32)
        ta_b = jnp.zeros((1,), F32)

    # serial-chain shortening: the stopnet folds THROUGH the projection —
    # stop([h2, dec_out]) with dec_out = proj_in @ Wp + bp equals
    # proj_in @ (Wp @ So + [Sh ; 0]) + (bs + bp@So) where stop_w = [Sh ; So]
    # splits at H2 — so the in-kernel stop logit is one matmul on proj_in,
    # in parallel with dec_out instead of serially after it (measured:
    # batch-1 500-step decode min 28.5 -> 26.0 ms on v5e, ~9%)
    H2d = p_dec["decoder_rnn"]["wh"].shape[0]
    sw = p_dec["stopnet"]["w"]                                 # [H2+OW, 1]
    so = sw[H2d:, :]
    stop_w_eff = jnp.matmul(p_dec["projection"]["w"], so)      # [H2+E, 1]
    stop_w_eff = stop_w_eff.at[:H2d].add(sw[:H2d, :])
    stop_b_eff = p_dec["stopnet"]["b"] + jnp.matmul(
        p_dec["projection"]["b"], so)
    # row-split every [a|b]-input weight at trace time (free): the kernel
    # then matmuls the parts separately instead of concatenating inputs on
    # the serial chain (see _lstm docstring)
    P = p_dec["prenet"]["linears"][1]["w"].shape[1]            # prenet out
    a_wx = p_dec["attention_rnn"]["wx"]                        # [P+E, 4H1]
    d_wx = p_dec["decoder_rnn"]["wx"]                          # [H1+E, 4H2]
    proj_full = p_dec["projection"]["w"]                       # [H2+E, OW]
    weights = [
        p_dec["prenet"]["linears"][0]["w"], p_dec["prenet"]["linears"][0]["b"],
        p_dec["prenet"]["linears"][1]["w"], p_dec["prenet"]["linears"][1]["b"],
        a_wx[:P], a_wx[P:], p_dec["attention_rnn"]["wh"],
        p_dec["attention_rnn"]["b"],
        q_w, k_loc,
        v_w, v_b,
        d_wx[:H1], d_wx[H1:], p_dec["decoder_rnn"]["wh"],
        p_dec["decoder_rnn"]["b"],
        proj_full[:H2d], proj_full[H2d:], p_dec["projection"]["b"],
        stop_w_eff[:H2d], stop_w_eff[H2d:], stop_b_eff,
        shift_w, ta_w[:E], ta_w[E:], ta_b, gl1_w, gl1_b, g3_w, g3_b,
    ]
    # biases and the attention v vector stay f32 (accumulator side); matmul
    # operands in bf16 (MXU-native) unless overridden
    bias_ix = {1, 3, 7, 10, 11, 15, 18, 21, 25, 27, 29}
    weights = [jnp.asarray(w, F32 if i in bias_ix else dtype)
               for i, w in enumerate(weights)]

    out_width = p_dec["projection"]["w"].shape[1]              # n_mels*r_init
    maskadd = jnp.where(mask, 0.0, -1e9).astype(F32)

    w_specs = [pl.BlockSpec(w.shape, (lambda i, *_, n=w.ndim: (0,) * n),
                            memory_space=pltpu.VMEM) for w in weights]
    s_specs = [pl.BlockSpec(s.shape, (lambda i, *_: (0, 0)),
                            memory_space=pltpu.VMEM) for s in state0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((B, T, E), lambda i, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(processed_inputs.shape, lambda i, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, T), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ] + w_specs + s_specs,
        out_specs=(
            pl.BlockSpec((chunk, B, out_width), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, B, T), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, B, 1), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ) + tuple(pl.BlockSpec(s.shape, (lambda i, *_: (0, 0)),
                               memory_space=pltpu.VMEM) for s in state0),
        scratch_shapes=[
            pltpu.VMEM((B, p_dec["attention_rnn"]["wh"].shape[0]), F32),  # h1
            pltpu.VMEM((B, p_dec["attention_rnn"]["wh"].shape[0]), F32),  # c1
            pltpu.VMEM((B, p_dec["decoder_rnn"]["wh"].shape[0]), F32),    # h2
            pltpu.VMEM((B, p_dec["decoder_rnn"]["wh"].shape[0]), F32),    # c2
            pltpu.VMEM((B, E), F32),                                      # ctx
            pltpu.VMEM((B, T + 2 * LOC_HALO if loc_tiled else T), F32),   # att
            pltpu.VMEM((B, T + 2 * LOC_HALO if loc_tiled else T), F32),   # cum
            pltpu.VMEM((B, n_mels), F32),                                 # frame
            pltpu.VMEM((B, 1), F32),                                      # done
            pltpu.VMEM((B, T), F32),                                      # alpha
            pltpu.VMEM((B, 1), F32),                                      # win
            pltpu.VMEM((B, 128), F32),                                    # mu
        ],
    )
    kernel = functools.partial(
        _kernel, chunk=chunk, n_mels=n_mels, r=r, norm=norm,
        thresh=thresh, prenet_dropout=prenet_dropout, dtype=dtype,
        windowing=windowing, win_back=win_back, win_front=win_front,
        forward_attn=forward_attn, trans_agent=trans_agent,
        forward_attn_mask=forward_attn_mask, graves=graves, n_gmm=attn_K,
        loc_tiled=loc_tiled, loc_attn=loc_attn)
    dec_out, aligns, stops, *stream_out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((n_steps, B, out_width), F32),
                   jax.ShapeDtypeStruct((n_steps, B, T), F32),
                   jax.ShapeDtypeStruct((n_steps, B, 1), F32))
        + tuple(jax.ShapeDtypeStruct(s.shape, F32) for s in state0),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            # derived from the device's actual VMEM (capacity.py); a routing
            # mis-estimate then fails at compile time, never mis-executes
            vmem_limit_bytes=kernel_vmem_limit()),
    )(jnp.asarray([seed], jnp.int32), enc_out.astype(dtype),
      processed_inputs.astype(F32), maskadd, *weights, *state0)

    dec_out = dec_out[:max_steps, :B0]
    aligns = aligns[:max_steps, :B0, :T0]
    stops = stops[:max_steps, :B0, 0]
    B = B0
    # lengths in r-groups, inference_scan semantics: a step counts while the
    # sample was still active at its START (done fires the step AFTER the
    # stop token's own step, which itself still counts)
    fired = stops > thresh                                     # [steps, B]
    done_before = jnp.cumsum(fired.astype(jnp.int32), axis=0) > 0
    done_at_start = jnp.concatenate(
        [jnp.zeros((1, B), bool), done_before[:-1]], axis=0)
    lengths = jnp.sum(1 - done_at_start.astype(jnp.int32), axis=0)
    if return_stream:
        h1f, c1f, h2f, c2f, frf = [s[:B0] for s in stream_out]
        return dec_out, aligns, stops, lengths, ((h1f, c1f), (h2f, c2f), frf)
    return dec_out, aligns, stops, lengths
