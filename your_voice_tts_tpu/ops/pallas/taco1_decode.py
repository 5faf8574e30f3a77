"""Tacotron(1) autoregressive decode as a weights-in-VMEM Pallas TPU kernel.

Same design as ops/pallas/taco2_decode.py (which see), specialized to the
Tacotron(1) decoder (reference layers/tacotron.py Decoder; models/tacotron.py
TacotronDecoder here): prenet over the MEMORY QUEUE (last memory_size frames),
GRU attention cell, location-sensitive attention via the pre-folded banded
K_loc matmul, project-to-decoder dense, two residual GRUs, r-frame mel
projection + stopnet.

- grid = (n_chunks,) sequential chunks; GRU hiddens / attention state /
  context / memory queue persist in VMEM scratch.
- the memory queue is a flat [B, memory_size * n_mels] rolling buffer:
  each step drops the oldest r frames and appends the r just-emitted ones
  (pure lane-dim concat, no scatter).
- in-kernel early exit after every sample fires its stop token, like taco2.
- texts past MAX_T_BANDED auto-route onto taco2's shift-invariant TILED
  location formulation (taco2_decode._tile_matrices): constant VMEM in T,
  alignments carried at offset LOC_HALO in halo-padded att/cum scratch.

Covers the default attention configuration; models/tacotron.py falls back to
the XLA scan otherwise (supported_config below).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .capacity import kernel_vmem_limit
from .taco2_decode import (  # noqa: F401
    LOC_HALO, LOC_TILE, MAX_T_BANDED, _band_matrices, _tile_matrices,
    supported_config)
from .wavernn_gen import _fmix32, _uniform

F32 = jnp.float32
BF16 = jnp.bfloat16


def _gru(x, h, wx, wh, bx, bh, dtype):
    """Fused GRU cell, torch gate order (r, z, n) — nn/rnn.py parity.
    x/wx may be matching tuples: a caller's input CONCAT is replaced by
    row-split weight matmuls summed into gx (an in-kernel concatenate is a
    VMEM copy on the serial chain — taco2_decode._lstm measurement)."""
    if isinstance(x, tuple):
        gx = bx[...]
        for xi, wi in zip(x, wx):
            gx = gx + jnp.dot(xi.astype(dtype), wi[...],
                              preferred_element_type=F32)
    else:
        gx = jnp.dot(x.astype(dtype), wx[...],
                     preferred_element_type=F32) + bx[...]
    gh = jnp.dot(h.astype(dtype), wh[...], preferred_element_type=F32) + bh[...]
    H = h.shape[-1]
    r = jax.nn.sigmoid(gx[..., :H] + gh[..., :H])
    z = jax.nn.sigmoid(gx[..., H:2 * H] + gh[..., H:2 * H])
    n = jnp.tanh(gx[..., 2 * H:] + r * gh[..., 2 * H:])
    return (1.0 - z) * n + z * h


def _kernel(seed_ref, inputs_ref, pinp_ref, maskadd_ref,
            p1_w, p1_b, p2_w, p2_b,
            a_wx_x, a_wx_c, a_wh, a_bx, a_bh, q_w, k_loc, v_w, v_b,
            pj_w_a, pj_w_c, pj_b,
            d1_wx, d1_wh, d1_bx, d1_bh, d2_wx, d2_wh, d2_bx, d2_bh,
            pm_w, pm_b, stop_w, stop_b,
            out_ref, align_ref, stop_ref,
            ah_ref, h1_ref, h2_ref, ctx_ref, att_ref, cum_ref, queue_ref,
            done_ref,
            *, chunk: int, n_mels: int, r: int, norm: str, thresh: float,
            prenet_dropout: bool, dtype, loc_tiled: bool):
    # tiled location attention stores alignments at offset LOC_HALO inside
    # halo-padded [B, T + 2*LOC_HALO] att/cum scratch (taco2_decode)
    OFF = LOC_HALO if loc_tiled else 0

    @pl.when(pl.program_id(0) == 0)
    def _():
        ah_ref[...] = jnp.zeros_like(ah_ref)
        h1_ref[...] = jnp.zeros_like(h1_ref)
        h2_ref[...] = jnp.zeros_like(h2_ref)
        ctx_ref[...] = jnp.zeros_like(ctx_ref)
        att_ref[...] = jnp.zeros_like(att_ref)
        cum_ref[...] = jnp.zeros_like(cum_ref)
        queue_ref[...] = jnp.zeros_like(queue_ref)
        done_ref[...] = jnp.zeros_like(done_ref)

    seed = seed_ref[0]
    chunk_base = pl.program_id(0) * np.int32(chunk)
    B, T = maskadd_ref.shape
    all_done = jnp.sum(1.0 - done_ref[...]) == 0.0

    @pl.when(all_done)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)
        align_ref[...] = jnp.zeros_like(align_ref)
        stop_ref[...] = jnp.zeros_like(stop_ref)

    def body(t, _):
        key = _fmix32(seed + (chunk_base + t) * np.int32(-1640531527))
        # --- prenet over the memory queue -----------------------------------
        x = queue_ref[...]                             # [B, M*n_mels]
        x = jax.nn.relu(jnp.dot(x.astype(dtype), p1_w[...],
                                preferred_element_type=F32) + p1_b[...])
        if prenet_dropout:
            x = jnp.where(_uniform(x.shape, key, 21) < 0.5, 0.0, x * 2.0)
        x = jax.nn.relu(jnp.dot(x.astype(dtype), p2_w[...],
                                preferred_element_type=F32) + p2_b[...])
        if prenet_dropout:
            x = jnp.where(_uniform(x.shape, key, 22) < 0.5, 0.0, x * 2.0)

        # --- attention GRU + location-sensitive attention -------------------
        # input concats replaced by trace-time row-split weights (wrapper)
        ah = _gru((x, ctx_ref[...]), ah_ref[...], (a_wx_x, a_wx_c), a_wh,
                  a_bx, a_bh, dtype)
        pq = jnp.dot(ah.astype(dtype), q_w[...], preferred_element_type=F32)
        A = pq.shape[-1]
        if loc_tiled:
            # constant-VMEM tile formulation (taco2_decode._tile_matrices):
            # one shared [2*384, 128*A] matrix against halo-padded slabs
            e_parts = []
            for i in range(T // LOC_TILE):
                a_slab = att_ref[:, i * LOC_TILE: i * LOC_TILE + LOC_TILE
                                 + 2 * LOC_HALO]
                c_slab = cum_ref[:, i * LOC_TILE: i * LOC_TILE + LOC_TILE
                                 + 2 * LOC_HALO]
                ac = jnp.concatenate([a_slab, c_slab], axis=-1)  # [B, 768]
                f_t = jnp.dot(ac.astype(dtype), k_loc[...],
                              preferred_element_type=F32)       # [B, 128*A]
                f_t = f_t.reshape(B, LOC_TILE, A)
                th = jnp.tanh(pq[:, None, :] + f_t
                              + pinp_ref[:, i * LOC_TILE:(i + 1) * LOC_TILE, :])
                e_parts.append(jnp.sum(th * v_w[...][None, None, :], axis=-1))
            e = (jnp.concatenate(e_parts, axis=-1) if len(e_parts) > 1
                 else e_parts[0]) + v_b[...]
        else:
            ac = jnp.concatenate([att_ref[...], cum_ref[...]], axis=-1)
            f_proj = jnp.dot(ac.astype(dtype), k_loc[...],
                             preferred_element_type=F32).reshape(B, T, A)
            tanh_arg = jnp.tanh(pq[:, None, :] + f_proj + pinp_ref[...])
            e = jnp.sum(tanh_arg * v_w[...][None, None, :], axis=-1) + v_b[...]
        e = e + maskadd_ref[...]
        if norm == "softmax":
            align = jax.nn.softmax(e, axis=-1)
        else:
            s = jax.nn.sigmoid(e)
            align = s / jnp.maximum(jnp.sum(s, axis=-1, keepdims=True), 1e-8)
        ctx = jnp.sum(align[:, :, None] * inputs_ref[...], axis=1)

        # --- project + residual GRU stack + heads ---------------------------
        xd = (jnp.dot(ah.astype(dtype), pj_w_a[...],
                      preferred_element_type=F32)
              + jnp.dot(ctx.astype(dtype), pj_w_c[...],
                        preferred_element_type=F32) + pj_b[...])
        h1 = _gru(xd, h1_ref[...], d1_wx, d1_wh, d1_bx, d1_bh, dtype)
        xd = xd + h1
        h2 = _gru(xd, h2_ref[...], d2_wx, d2_wh, d2_bx, d2_bh, dtype)
        xd = xd + h2
        output = jnp.dot(xd.astype(dtype), pm_w[...],
                         preferred_element_type=F32) + pm_b[...]
        # stopnet folded through proj_mel at trace time (wrapper):
        # stop([xd, output]) becomes one matmul on xd, in parallel with
        # output instead of serially after it
        stop_logit = jnp.dot(xd.astype(dtype), stop_w[...],
                             preferred_element_type=F32) + stop_b[...]
        stop_prob = jax.nn.sigmoid(stop_logit[:, 0])

        # --- stop masking + memory-queue roll -------------------------------
        active = 1.0 - done_ref[...][:, 0]
        out_r = output[..., : n_mels * r] * active[:, None]
        done = jnp.maximum(done_ref[...][:, 0],
                           (stop_prob > thresh).astype(F32))
        queue_ref[...] = jnp.concatenate(
            [queue_ref[...][:, n_mels * r:], out_r], axis=-1)

        ah_ref[...] = ah
        h1_ref[...] = h1
        h2_ref[...] = h2
        ctx_ref[...] = ctx
        att_ref[:, OFF:OFF + T] = align
        cum_ref[:, OFF:OFF + T] = cum_ref[:, OFF:OFF + T] + align
        done_ref[...] = done[:, None]
        out_ref[t] = output * active[:, None]
        align_ref[t] = align
        stop_ref[t] = stop_prob[:, None]
        return 0

    @pl.when(jnp.logical_not(all_done))
    def _():
        lax.fori_loop(0, chunk, body, 0)


def taco1_supported(cfg, memory_size: int, r: int) -> bool:
    """Kernel coverage: default attention config AND the queue must be able
    to roll by whole steps (r frames <= memory span). Unlike the Tacotron2
    kernel, this one does NOT implement Graves GMM attention / windowing /
    forward attention / transition agent in-kernel — those fall back to the
    XLA scan (supported_config alone admits Graves for the Tacotron2
    kernel, so the attention_type must be re-checked here)."""
    M = memory_size if memory_size > 0 else r
    return (supported_config(cfg) and cfg.attention_type == "original"
            and cfg.location_attn and r <= M
            and not cfg.windowing and not cfg.use_forward_attn
            and not cfg.transition_agent)


def tacotron1_decode_pallas(p_dec: dict, enc_out, processed_inputs, mask,
                            *, n_mels: int, r: int, memory_size: int,
                            max_steps: int, norm: str = "sigmoid",
                            thresh: float = 0.6, prenet_dropout: bool = True,
                            seed: int = 0, chunk: int = 50,
                            interpret: bool = False, dtype=BF16,
                            loc_tiled: bool | None = None):
    """Free-running Tacotron(1) decode, whole loop in one kernel launch.

    Mirrors tacotron2_decode_pallas: returns (outputs [steps, B, n_mels *
    r_init], alignments [steps, B, T], stop_probs [steps, B], lengths [B]
    in r-groups) matching TacotronDecoder.inference's stacked outputs.

    loc_tiled: None auto-selects the location-attention formulation — the
    single banded matmul for T <= MAX_T_BANDED, the constant-VMEM tiled
    formulation (taco2_decode._tile_matrices) beyond it; True/False force
    it. Tiled pads T up to a 128 multiple internally (alignments sliced
    back)."""
    B0, T, E = enc_out.shape
    B = ((B0 + 7) // 8) * 8
    if B != B0:
        padb = ((0, B - B0),)
        enc_out = jnp.pad(enc_out, padb + ((0, 0), (0, 0)))
        processed_inputs = jnp.pad(processed_inputs, padb + ((0, 0), (0, 0)))
        mask = jnp.pad(mask, padb + ((0, 0),))
    if loc_tiled is None:
        loc_tiled = T > MAX_T_BANDED
    loc_tiled = bool(loc_tiled)
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
    n_steps = ((max_steps + chunk - 1) // chunk) * chunk
    n_chunks = n_steps // chunk
    M = memory_size if memory_size > 0 else r

    if not loc_tiled and T > MAX_T_BANDED:
        raise ValueError(
            f"banded location attention serves T <= {MAX_T_BANDED} "
            f"(got {T}); use loc_tiled=True (the auto-route default) or "
            f"the XLA scan path for longer inputs")
    q_w = p_dec["attention"]["query"]["w"]
    v_w = p_dec["attention"]["v"]["w"][:, 0]
    wdense = p_dec["attention"]["loc_dense"]["w"]
    A0 = q_w.shape[1]
    A = ((A0 + 127) // 128) * 128
    if A != A0:
        padA = ((0, 0), (0, A - A0))
        q_w = jnp.pad(q_w, padA)
        wdense = jnp.pad(wdense, padA)
        v_w = jnp.pad(v_w, ((0, A - A0),))
        processed_inputs = jnp.pad(processed_inputs,
                                   ((0, 0), (0, 0), (0, A - A0)))
    k_loc = (_tile_matrices(p_dec["attention"]["loc_conv"]["w"], wdense,
                            dtype) if loc_tiled
             else _band_matrices(p_dec["attention"]["loc_conv"]["w"], wdense,
                                 T, dtype))

    g1, g2 = p_dec["decoder_rnns"]
    # trace-time serial-chain shortenings (same moves as taco2_decode):
    # row-split the [prenet|ctx] and [ah|ctx] input weights (no in-kernel
    # concats), and fold the stopnet through proj_mel — stop([xd, output])
    # with output = xd@Wm + bm equals xd @ (Sx + Wm@So) + (sb + bm@So)
    # where stop_w = [Sx ; So] splits at xd's width
    P = p_dec["prenet"]["linears"][1]["w"].shape[1]
    Ha = p_dec["attention_rnn"]["wh"].shape[0]
    D = p_dec["project"]["w"].shape[1]
    a_wx = p_dec["attention_rnn"]["wx"]                        # [P+E, 3Ha]
    pj_w = p_dec["project"]["w"]                               # [Ha+E, D]
    sw = p_dec["stopnet"]["w"]                                 # [D+OW, 1]
    stop_w_eff = sw[:D] + jnp.matmul(p_dec["proj_mel"]["w"], sw[D:])
    stop_b_eff = p_dec["stopnet"]["b"] + jnp.matmul(
        p_dec["proj_mel"]["b"], sw[D:])
    weights = [
        p_dec["prenet"]["linears"][0]["w"], p_dec["prenet"]["linears"][0]["b"],
        p_dec["prenet"]["linears"][1]["w"], p_dec["prenet"]["linears"][1]["b"],
        a_wx[:P], a_wx[P:], p_dec["attention_rnn"]["wh"],
        p_dec["attention_rnn"]["bx"], p_dec["attention_rnn"]["bh"],
        q_w, k_loc, v_w, p_dec["attention"]["v"]["b"],
        pj_w[:Ha], pj_w[Ha:], p_dec["project"]["b"],
        g1["wx"], g1["wh"], g1["bx"], g1["bh"],
        g2["wx"], g2["wh"], g2["bx"], g2["bh"],
        p_dec["proj_mel"]["w"], p_dec["proj_mel"]["b"],
        stop_w_eff, stop_b_eff,
    ]
    bias_ix = {1, 3, 7, 8, 11, 12, 15, 18, 19, 22, 23, 25, 27}
    weights = [jnp.asarray(w, F32 if i in bias_ix else dtype)
               for i, w in enumerate(weights)]

    out_width = p_dec["proj_mel"]["w"].shape[1]               # n_mels*r_init
    maskadd = jnp.where(mask, 0.0, -1e9).astype(F32)
    w_dim = p_dec["attention_rnn"]["wh"].shape[0]

    w_specs = [pl.BlockSpec(w.shape, (lambda i, *_, n=w.ndim: (0,) * n),
                            memory_space=pltpu.VMEM) for w in weights]
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
        ] + w_specs,
        out_specs=(
            pl.BlockSpec((chunk, B, out_width), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, B, T), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, B, 1), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((B, w_dim), F32),                      # attn GRU h
            pltpu.VMEM((B, w_dim), F32),                      # dec GRU 1 h
            pltpu.VMEM((B, w_dim), F32),                      # dec GRU 2 h
            pltpu.VMEM((B, E), F32),                          # context
            pltpu.VMEM((B, T + 2 * LOC_HALO if loc_tiled else T), F32),  # att
            pltpu.VMEM((B, T + 2 * LOC_HALO if loc_tiled else T), F32),  # cum
            pltpu.VMEM((B, M * n_mels), F32),                 # memory queue
            pltpu.VMEM((B, 1), F32),                          # done
        ],
    )
    kernel = functools.partial(
        _kernel, chunk=chunk, n_mels=n_mels, r=r, norm=norm, thresh=thresh,
        prenet_dropout=prenet_dropout, dtype=dtype, loc_tiled=loc_tiled)
    out, aligns, stops = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((n_steps, B, out_width), F32),
                   jax.ShapeDtypeStruct((n_steps, B, T), F32),
                   jax.ShapeDtypeStruct((n_steps, B, 1), F32)),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=kernel_vmem_limit()),
    )(jnp.asarray([seed], jnp.int32), enc_out.astype(dtype),
      processed_inputs.astype(F32), maskadd, *weights)

    out = out[:max_steps, :B0]
    aligns = aligns[:max_steps, :B0, :T0]
    stops = stops[:max_steps, :B0, 0]
    fired = stops > thresh
    done_before = jnp.cumsum(fired.astype(jnp.int32), axis=0) > 0
    done_at_start = jnp.concatenate(
        [jnp.zeros((1, B0), bool), done_before[:-1]], axis=0)
    lengths = jnp.sum(1 - done_at_start.astype(jnp.int32), axis=0)
    return out, aligns, stops, lengths
