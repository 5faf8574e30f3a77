"""Teacher-forced Tacotron2 decoder scan as Pallas TPU training kernels.

Why: after the custom-VJP restructure (models/decoder_grad.py) the training
decoder is bound by the SERIAL LATENCY of its per-step op chain, not by
FLOPs or HBM traffic — measured on v5e, the isolated decoder grad was
unchanged (64.9 vs 65.1 ms at B=128 x 200 steps) when the backward carry
traffic was removed, and ablating individual ops in the serving kernel does
not move its ~112 us step either. XLA's scan steps cost ~100-160 us in
dispatch-chain latency; the serving decode kernel's steps cost ~63 us. These
kernels apply the same treatment to the TRAINING path:

- `taco2_train_fwd_pallas`: the teacher-forced forward scan
  (decoder_grad.fwd_scan) in one kernel launch — weights resident in VMEM,
  grid = sequential time chunks, per-step residuals (gates, cell states)
  streamed to HBM output stacks in the exact layout the custom-VJP backward
  consumes. Prenet is precomputed outside (teacher forcing: inputs are
  ground truth, so it is one batched matmul, not part of the recurrence),
  and so are the dropout masks (jax.random, identical to the XLA path).
- `taco2_train_bwd_pallas`: the reverse scan of decoder_grad.core_bwd in one
  kernel launch — carries ONLY activation-sized cotangents, emits per-step
  gate cotangents (the weight gradients stay whole-sequence post-scan
  matmuls) plus the per-step energy cotangent d_e. The attention WEIGHT
  gradients are then recovered outside the kernel by one batched jax.vjp
  over the model's own `_energies` (all steps folded into the batch dim) —
  same parameterization, same numerics, MXU-batched instead of serial.

Both kernels mirror decoder_grad.make_scan_core's math op for op; routing
lives there (fast_grad path) and falls back to the XLA scan off-TPU or when
the working set exceeds VMEM (capacity.taco2_train_fits).

Reference parity anchor: the reference's layers/tacotron2.py Decoder
teacher-forced python loop (SURVEY.md SS3.1 inner hot loop) — same math,
kernel-resident recurrence.
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
from .taco2_decode import _band_matrices

F32 = jnp.float32
BF16 = jnp.bfloat16


def _pad_steps(x, n_steps):
    """Zero-pad a time-major [T, ...] stack to n_steps rows."""
    if x.shape[0] == n_steps:
        return x
    pad = [(0, n_steps - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, pad)


def _pad_batch(x, B, axis=0):
    if x.shape[axis] == B:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, B - x.shape[axis])
    return jnp.pad(x, pad)


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------

def _fwd_kernel(prenet_ref, m_a_ref, m_d_ref,
                enc_ref, pinp_ref, maskadd_ref,
                a_wx_x, a_wx_c, a_wh, a_b,
                q_w, k_loc, v_w, v_b,
                d_wx_h, d_wx_c, d_wh, d_b,
                dech_ref, ctx_out_ref, align_ref,
                g_a_ref, g_d_ref, c_a_ref, c_d_ref,
                h1_s, c1_s, h2_s, c2_s, ctx_s, att_s, cum_s,
                *, chunk: int, norm: str, dtype, use_dropout: bool,
                loc_attn: bool):
    step0 = pl.program_id(0) == 0

    @pl.when(step0)
    def _():
        h1_s[...] = jnp.zeros_like(h1_s)
        c1_s[...] = jnp.zeros_like(c1_s)
        h2_s[...] = jnp.zeros_like(h2_s)
        c2_s[...] = jnp.zeros_like(c2_s)
        ctx_s[...] = jnp.zeros_like(ctx_s)
        att_s[...] = jnp.zeros_like(att_s)
        cum_s[...] = jnp.zeros_like(cum_s)

    B, T = maskadd_ref.shape
    H1 = h1_s.shape[-1]
    H2 = h2_s.shape[-1]

    def lstm(x_parts, wx_parts, h, c, wh, b):
        """fwd_scan's _lstm_fwd with the input concat replaced by row-split
        matmuls (an in-kernel concatenate is a VMEM copy on the serial
        chain). Gate math runs f32 on the VPU (Mosaic's transcendentals are
        f32; matmul accumulation already is); gates/states round to the
        compute dtype at the residual and scratch writes, mirroring the XLA
        scan's bf16 stacks."""
        g = jnp.dot(h, wh[...], preferred_element_type=F32) + b[...]
        for x, wx in zip(x_parts, wx_parts):
            g = g + jnp.dot(x, wx[...], preferred_element_type=F32)
        H = h.shape[-1]
        i = jax.nn.sigmoid(g[..., :H])
        f = jax.nn.sigmoid(g[..., H:2 * H])
        gg = jnp.tanh(g[..., 2 * H:3 * H])
        o = jax.nn.sigmoid(g[..., 3 * H:])
        c2 = f * c.astype(F32) + i * gg
        h2 = o * jnp.tanh(c2)
        return h2, c2, g.astype(dtype)

    def body(t, _):
        x_t = prenet_ref[t]                                     # [B, P]
        h1, c1, g_a = lstm((x_t, ctx_s[...]), (a_wx_x, a_wx_c),
                           h1_s[...], c1_s[...], a_wh, a_b)
        q = (h1 * m_a_ref[t].astype(F32) if use_dropout
             else h1).astype(dtype)                             # [B, H1]

        # --- location-sensitive energies (f32, matching _normalize) -------
        pq = jnp.dot(q, q_w[...], preferred_element_type=F32)   # [B, A]
        A = pq.shape[-1]
        if loc_attn:
            ac = jnp.concatenate([att_s[...], cum_s[...]],
                                 axis=-1).astype(dtype)          # [B, 2T]
            f_proj = jnp.dot(ac, k_loc[...],
                             preferred_element_type=F32)         # [B, T*A]
            tanh_arg = jnp.tanh(pq[:, None, :] + f_proj.reshape(B, T, A)
                                + pinp_ref[...])
        else:
            tanh_arg = jnp.tanh(pq[:, None, :] + pinp_ref[...])
        e = (jnp.sum(tanh_arg * v_w[...][None, None, :], axis=-1)
             + v_b[...] + maskadd_ref[...])                      # [B, T]
        if norm == "softmax":
            align = jax.nn.softmax(e, axis=-1)
        else:
            s = jax.nn.sigmoid(e)
            align = s / jnp.maximum(jnp.sum(s, axis=-1, keepdims=True), 1e-8)
        ctx = jnp.sum(align[:, :, None] * enc_ref[...],
                      axis=1).astype(dtype)                      # [B, E]

        h2, c2, g_d = lstm((q, ctx), (d_wx_h, d_wx_c),
                           h2_s[...], c2_s[...], d_wh, d_b)
        dech = h2 * m_d_ref[t].astype(F32) if use_dropout else h2

        h1_s[...] = h1.astype(dtype)
        c1_s[...] = c1.astype(dtype)
        h2_s[...] = h2.astype(dtype)
        c2_s[...] = c2.astype(dtype)
        ctx_s[...] = ctx
        att_s[...] = align
        cum_s[...] = cum_s[...] + align

        dech_ref[t] = dech.astype(dtype)
        ctx_out_ref[t] = ctx
        align_ref[t] = align
        g_a_ref[t] = g_a
        g_d_ref[t] = g_d
        c_a_ref[t] = c1.astype(dtype)
        c_d_ref[t] = c2.astype(dtype)
        return 0

    lax.fori_loop(0, chunk, body, 0)


def taco2_train_fwd_pallas(p_core: dict, prenet_t, enc_out, processed_inputs,
                           maskf, m_a_t, m_d_t, *, norm: str = "sigmoid",
                           loc_attn: bool = True, chunk: int = 4,
                           interpret: bool = False):
    """Teacher-forced decoder forward scan, whole loop in one kernel launch.

    Mirrors decoder_grad.fwd_scan: returns the same 7-tuple of time-major
    stacks (dech_t, ctx_t, align_t, g_a, g_d, c_a, c_d). m_a_t/m_d_t are the
    precomputed dropout multiplier stacks ([T,B,H] in the compute dtype) or
    None when dropout is off; computing them outside with jax.random keeps
    the kernel bit-consistent with the XLA path's masks.
    """
    Ts, B0, P = prenet_t.shape
    _, T, E = enc_out.shape
    dtype = prenet_t.dtype
    H1 = p_core["attention_rnn"]["wh"].shape[0]
    H2 = p_core["decoder_rnn"]["wh"].shape[0]
    use_dropout = m_a_t is not None

    # Mosaic rejects sub-sublane batches; pad to a multiple of 8. Padded rows
    # carry mask=False -> zero alignments -> finite, discarded outputs.
    B = max(8, ((B0 + 7) // 8) * 8)
    enc_out = _pad_batch(enc_out, B)
    processed_inputs = _pad_batch(processed_inputs, B)
    maskf = _pad_batch(maskf, B)
    prenet_t = _pad_batch(prenet_t, B, axis=1)
    if use_dropout:
        m_a_t = jnp.broadcast_to(m_a_t, (Ts, m_a_t.shape[1], H1))
        m_d_t = jnp.broadcast_to(m_d_t, (Ts, m_d_t.shape[1], H2))
        m_a_t = _pad_batch(m_a_t.astype(dtype), B, axis=1)
        m_d_t = _pad_batch(m_d_t.astype(dtype), B, axis=1)
    else:
        m_a_t = jnp.zeros((Ts, 8, 128), dtype)   # dummy block, never read
        m_d_t = jnp.zeros((Ts, 8, 128), dtype)

    # pad the attention dim to a full lane multiple (in-kernel [B, T*A] ->
    # [B, T, A] reshape requires it); zero columns contribute exactly nothing
    q_w = p_core["attention"]["query"]["w"]
    v_w = p_core["attention"]["v"]["w"][:, 0]
    v_b = p_core["attention"]["v"]["b"]
    A0 = q_w.shape[1]
    A = ((A0 + 127) // 128) * 128
    if A != A0:
        q_w = jnp.pad(q_w, ((0, 0), (0, A - A0)))
        v_w = jnp.pad(v_w, ((0, A - A0),))
        processed_inputs = jnp.pad(processed_inputs,
                                   ((0, 0), (0, 0), (0, A - A0)))
    if loc_attn:
        wdense = jnp.pad(p_core["attention"]["loc_dense"]["w"],
                         ((0, 0), (0, A - A0))) if A != A0 else \
            p_core["attention"]["loc_dense"]["w"]
        k_loc = _band_matrices(p_core["attention"]["loc_conv"]["w"],
                               wdense, T, dtype)
    else:
        k_loc = jnp.zeros((8, 128), dtype)

    a_wx = p_core["attention_rnn"]["wx"]
    d_wx = p_core["decoder_rnn"]["wx"]
    weights = [a_wx[:P], a_wx[P:], p_core["attention_rnn"]["wh"],
               p_core["attention_rnn"]["b"],
               q_w, k_loc, v_w, v_b,
               d_wx[:H1], d_wx[H1:], p_core["decoder_rnn"]["wh"],
               p_core["decoder_rnn"]["b"]]
    bias_ix = {3, 6, 7, 11}
    weights = [jnp.asarray(w, F32 if i in bias_ix else dtype)
               for i, w in enumerate(weights)]

    n_steps = ((Ts + chunk - 1) // chunk) * chunk
    prenet_t = _pad_steps(prenet_t, n_steps)
    m_a_t = _pad_steps(m_a_t, n_steps)
    m_d_t = _pad_steps(m_d_t, n_steps)
    n_chunks = n_steps // chunk
    maskadd = jnp.where(maskf > 0.5, 0.0, -1e9).astype(F32)

    def cblk(shape):
        return pl.BlockSpec((chunk,) + shape, lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    def const(shape):
        n = len(shape)
        return pl.BlockSpec(shape, lambda i, n=n: (0,) * n,
                            memory_space=pltpu.VMEM)

    w_specs = [const(w.shape) for w in weights]
    out_shapes = (
        jax.ShapeDtypeStruct((n_steps, B, H2), dtype),    # dech
        jax.ShapeDtypeStruct((n_steps, B, E), dtype),     # ctx
        jax.ShapeDtypeStruct((n_steps, B, T), F32),       # align
        jax.ShapeDtypeStruct((n_steps, B, 4 * H1), dtype),  # g_a
        jax.ShapeDtypeStruct((n_steps, B, 4 * H2), dtype),  # g_d
        jax.ShapeDtypeStruct((n_steps, B, H1), dtype),    # c_a
        jax.ShapeDtypeStruct((n_steps, B, H2), dtype),    # c_d
    )
    kernel = functools.partial(
        _fwd_kernel, chunk=chunk, norm=norm, dtype=dtype,
        use_dropout=use_dropout, loc_attn=loc_attn)
    outs = pl.pallas_call(
        kernel,
        grid=(n_chunks,),
        in_specs=[cblk((B, P)), cblk(m_a_t.shape[1:]), cblk(m_d_t.shape[1:]),
                  const((B, T, E)), const((B, T, A)), const((B, T))]
        + w_specs,
        out_specs=tuple(cblk(s.shape[1:]) for s in out_shapes),
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((B, H1), dtype), pltpu.VMEM((B, H1), dtype),
            pltpu.VMEM((B, H2), dtype), pltpu.VMEM((B, H2), dtype),
            pltpu.VMEM((B, E), dtype),
            pltpu.VMEM((B, T), F32), pltpu.VMEM((B, T), F32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=kernel_vmem_limit()),
    )(prenet_t, m_a_t, m_d_t, enc_out.astype(dtype),
      processed_inputs.astype(dtype), maskadd, *weights)

    return tuple(o[:Ts, :B0] for o in outs)


# ---------------------------------------------------------------------------
# backward kernel
# ---------------------------------------------------------------------------

def _bwd_kernel(d_dech_ref, d_ctx_o_ref, d_align_o_ref,
                g_a_ref, g_d_ref, c_a_ref, c_d_ref,
                c_a_p_ref, c_d_p_ref, att_p_ref, cum_p_ref,
                m_a_ref, m_d_ref,
                enc_ref, pinp_ref, maskadd_ref,
                a_wx_x, a_wx_c, a_wh, q_w, k_loc, v_w, v_b,
                d_wx_h, d_wx_c, d_wh,
                dg_a_ref, dg_d_ref, dctx_ref, dpren_ref, de_ref,
                dh1_s, dc1_s, dh2_s, dc2_s, dctx_s, datt_s, dcum_s,
                *, chunk: int, norm: str, dtype, use_dropout: bool,
                loc_attn: bool, P: int):
    step0 = pl.program_id(0) == 0

    @pl.when(step0)
    def _():
        dh1_s[...] = jnp.zeros_like(dh1_s)
        dc1_s[...] = jnp.zeros_like(dc1_s)
        dh2_s[...] = jnp.zeros_like(dh2_s)
        dc2_s[...] = jnp.zeros_like(dc2_s)
        dctx_s[...] = jnp.zeros_like(dctx_s)
        datt_s[...] = jnp.zeros_like(datt_s)
        dcum_s[...] = jnp.zeros_like(dcum_s)

    B, T = maskadd_ref.shape
    H1 = dh1_s.shape[-1]
    H2 = dh2_s.shape[-1]
    A = q_w.shape[-1]

    def lstm_bwd_local(g, c_prev, c, d_h, d_c):
        """decoder_grad._lstm_bwd_local: backward through the gate
        nonlinearity from stored pre-activations (f32 math)."""
        H = c.shape[-1]
        i = jax.nn.sigmoid(g[..., :H])
        f = jax.nn.sigmoid(g[..., H:2 * H])
        gg = jnp.tanh(g[..., 2 * H:3 * H])
        o = jax.nn.sigmoid(g[..., 3 * H:])
        tc = jnp.tanh(c)
        d_o = d_h * tc
        d_ct = d_c + d_h * o * (1.0 - tc * tc)
        d_g = jnp.concatenate(
            [(d_ct * gg) * i * (1.0 - i),
             (d_ct * c_prev) * f * (1.0 - f),
             (d_ct * i) * (1.0 - gg * gg),
             d_o * o * (1.0 - o)], axis=-1)
        return d_g, d_ct * f

    def body(j, _):
        # reverse order inside the chunk: highest step first
        t = chunk - 1 - j
        g_a = g_a_ref[t].astype(F32)
        g_d = g_d_ref[t].astype(F32)
        c_a = c_a_ref[t].astype(F32)
        c_d = c_d_ref[t].astype(F32)

        # ---- forward recompute of the energy block (carry-independent:
        # everything here depends only on streamed residuals, so the MXU
        # work overlaps the carried cotangent chain below) ----
        q = jax.nn.sigmoid(g_a[..., 3 * H1:]) * jnp.tanh(c_a)
        if use_dropout:
            q = q * m_a_ref[t].astype(F32)
        pq = jnp.dot(q.astype(dtype), q_w[...], preferred_element_type=F32)
        if loc_attn:
            ac = jnp.concatenate([att_p_ref[t], cum_p_ref[t]],
                                 axis=-1).astype(dtype)          # [B, 2T]
            f_proj = jnp.dot(ac, k_loc[...], preferred_element_type=F32)
            tanh_arg = jnp.tanh(pq[:, None, :] + f_proj.reshape(B, T, A)
                                + pinp_ref[...])
        else:
            tanh_arg = jnp.tanh(pq[:, None, :] + pinp_ref[...])
        e = (jnp.sum(tanh_arg * v_w[...][None, None, :], axis=-1)
             + v_b[...] + maskadd_ref[...])
        if norm == "softmax":
            align = jax.nn.softmax(e, axis=-1)
            s = align
        else:
            s = jax.nn.sigmoid(e)
            S = jnp.maximum(jnp.sum(s, axis=-1, keepdims=True), 1e-8)
            align = s / S

        # ---- decoder LSTM backward (the carried chain starts here) ----
        d_h_d = dh2_s[...]
        if use_dropout:
            d_h_d = d_h_d + d_dech_ref[t].astype(F32) * m_d_ref[t].astype(F32)
        else:
            d_h_d = d_h_d + d_dech_ref[t].astype(F32)
        d_g_d, d_c_d_prev = lstm_bwd_local(g_d, c_d_p_ref[t].astype(F32),
                                           c_d, d_h_d, dc2_s[...])
        d_g_d_lo = d_g_d.astype(dtype)
        d_x_d = lax.dot_general(d_g_d_lo, d_wx_h[...],
                                dimension_numbers=(((1,), (1,)), ((), ())),
                                preferred_element_type=F32)      # [B, H1]
        d_ctx_dec = lax.dot_general(d_g_d_lo, d_wx_c[...],
                                    dimension_numbers=(((1,), (1,)), ((), ())),
                                    preferred_element_type=F32)  # [B, E]
        d_h_d_next = lax.dot_general(d_g_d_lo, d_wh[...],
                                     dimension_numbers=(((1,), (1,)), ((), ())),
                                     preferred_element_type=F32)
        d_q = d_x_d
        d_ctx_total = d_ctx_o_ref[t].astype(F32) + d_ctx_dec + dctx_s[...]

        # context = align @ enc: both cotangents
        d_align_ctx = jnp.sum(d_ctx_total[:, None, :]
                              * enc_ref[...].astype(F32), axis=-1)  # [B, T]
        d_align = (d_align_o_ref[t] + d_align_ctx
                   + datt_s[...] + dcum_s[...])

        # ---- normalization backward -> d_e ----
        if norm == "softmax":
            d_e = align * (d_align - jnp.sum(d_align * align, axis=-1,
                                             keepdims=True))
        else:
            inner = jnp.sum(d_align * s, axis=-1, keepdims=True) / S
            d_s = (d_align - inner) / S
            d_e = d_s * s * (1.0 - s)

        # ---- energy backward (recurrence path only; weight grads are the
        # caller's batched vjp over the same _energies) ----
        d_tanh = (d_e[:, :, None] * v_w[...][None, None, :]
                  * (1.0 - tanh_arg * tanh_arg))                 # [B, T, A]
        d_pq = jnp.sum(d_tanh, axis=1)                           # [B, A]
        d_q2 = lax.dot_general(d_pq.astype(dtype), q_w[...],
                               dimension_numbers=(((1,), (1,)), ((), ())),
                               preferred_element_type=F32)       # [B, H1]
        if loc_attn:
            d_f = d_tanh.reshape(B, T * A).astype(dtype)
            d_ac = lax.dot_general(d_f, k_loc[...],
                                   dimension_numbers=(((1,), (1,)), ((), ())),
                                   preferred_element_type=F32)   # [B, 2T]
            d_att_prev = d_ac[:, :T]
            d_cum_prev = d_ac[:, T:]
        else:
            d_att_prev = jnp.zeros((B, T), F32)
            d_cum_prev = jnp.zeros((B, T), F32)

        # ---- attention LSTM backward ----
        d_q_total = d_q + d_q2
        if use_dropout:
            d_q_total = d_q_total * m_a_ref[t].astype(F32)
        d_h_a = dh1_s[...] + d_q_total
        d_g_a, d_c_a_prev = lstm_bwd_local(g_a, c_a_p_ref[t].astype(F32),
                                           c_a, d_h_a, dc1_s[...])
        d_g_a_lo = d_g_a.astype(dtype)
        d_pren = lax.dot_general(d_g_a_lo, a_wx_x[...],
                                 dimension_numbers=(((1,), (1,)), ((), ())),
                                 preferred_element_type=F32)     # [B, P]
        d_ctx_carry = lax.dot_general(d_g_a_lo, a_wx_c[...],
                                      dimension_numbers=(((1,), (1,)), ((), ())),
                                      preferred_element_type=F32)
        d_h_a_next = lax.dot_general(d_g_a_lo, a_wh[...],
                                     dimension_numbers=(((1,), (1,)), ((), ())),
                                     preferred_element_type=F32)

        dh1_s[...] = d_h_a_next
        dc1_s[...] = d_c_a_prev
        dh2_s[...] = d_h_d_next
        dc2_s[...] = d_c_d_prev
        dctx_s[...] = d_ctx_carry
        datt_s[...] = d_att_prev
        dcum_s[...] = dcum_s[...] + d_cum_prev

        # gate/ctx/prenet cotangents round to the compute dtype, exactly as
        # the XLA custom-VJP path's stacks do — f32 accumulation for weight
        # grads happens in the caller's post-scan matmuls either way
        dg_a_ref[t] = d_g_a.astype(dtype)
        dg_d_ref[t] = d_g_d.astype(dtype)
        dctx_ref[t] = d_ctx_total.astype(dtype)
        dpren_ref[t] = d_pren.astype(dtype)
        de_ref[t] = d_e
        return 0

    lax.fori_loop(0, chunk, body, 0)


def taco2_train_bwd_pallas(p_core: dict, residuals: dict, cotangents: tuple,
                           enc_out, processed_inputs, maskf, m_a_t, m_d_t,
                           *, P: int, norm: str = "sigmoid",
                           loc_attn: bool = True, chunk: int = 4,
                           interpret: bool = False):
    """Reverse scan of decoder_grad.core_bwd in one kernel launch.

    residuals: dict with time-major stacks g_a, g_d, c_a, c_d (kernel-forward
    residuals), c_a_prev/c_d_prev (shifted cell stacks) and att_prev/cum_prev
    (shifted alignment stacks, f32). cotangents: (d_dech_t, d_ctx_out_t,
    d_align_out_t). P: prenet output width (the split point of the attention
    LSTM's input weights). Returns (d_g_a_t, d_g_d_t [T,B,4H], d_ctx_t
    [T,B,E], d_prenet_t [T,B,P] — all in the compute dtype — and d_e_t
    [T,B,T_in] f32); weight gradients are the caller's whole-sequence
    matmuls / batched energies-vjp.
    """
    d_dech_t, d_ctx_o_t, d_align_o_t = cotangents
    Ts, B0, _ = d_dech_t.shape
    _, T, E = enc_out.shape
    dtype = d_dech_t.dtype
    H1 = p_core["attention_rnn"]["wh"].shape[0]
    H2 = p_core["decoder_rnn"]["wh"].shape[0]
    use_dropout = m_a_t is not None

    B = max(8, ((B0 + 7) // 8) * 8)
    enc_out = _pad_batch(enc_out, B)
    processed_inputs = _pad_batch(processed_inputs, B)
    maskf = _pad_batch(maskf, B)

    q_w = p_core["attention"]["query"]["w"]
    v_w = p_core["attention"]["v"]["w"][:, 0]
    v_b = p_core["attention"]["v"]["b"]
    A0 = q_w.shape[1]
    A = ((A0 + 127) // 128) * 128
    if A != A0:
        q_w = jnp.pad(q_w, ((0, 0), (0, A - A0)))
        v_w = jnp.pad(v_w, ((0, A - A0),))
        processed_inputs = jnp.pad(processed_inputs,
                                   ((0, 0), (0, 0), (0, A - A0)))
    if loc_attn:
        wdense = jnp.pad(p_core["attention"]["loc_dense"]["w"],
                         ((0, 0), (0, A - A0))) if A != A0 else \
            p_core["attention"]["loc_dense"]["w"]
        k_loc = _band_matrices(p_core["attention"]["loc_conv"]["w"],
                               wdense, T, dtype)
    else:
        k_loc = jnp.zeros((8, 128), dtype)

    a_wx = p_core["attention_rnn"]["wx"]
    d_wx = p_core["decoder_rnn"]["wx"]
    weights = [a_wx[:P], a_wx[P:], p_core["attention_rnn"]["wh"],
               q_w, k_loc, v_w, v_b,
               d_wx[:H1], d_wx[H1:], p_core["decoder_rnn"]["wh"]]
    bias_ix = {6}
    weights = [jnp.asarray(w, F32 if i in bias_ix else dtype)
               for i, w in enumerate(weights)]

    n_steps = ((Ts + chunk - 1) // chunk) * chunk
    n_chunks = n_steps // chunk

    def prep(x):
        return _pad_steps(_pad_batch(x, B, axis=1), n_steps)

    d_dech_t = prep(d_dech_t)
    d_ctx_o_t = prep(d_ctx_o_t)
    d_align_o_t = prep(d_align_o_t.astype(F32))
    g_a = prep(residuals["g_a"])
    g_d = prep(residuals["g_d"])
    c_a = prep(residuals["c_a"])
    c_d = prep(residuals["c_d"])
    c_a_p = prep(residuals["c_a_prev"])
    c_d_p = prep(residuals["c_d_prev"])
    att_p = prep(residuals["att_prev"].astype(F32))
    cum_p = prep(residuals["cum_prev"].astype(F32))
    if use_dropout:
        m_a_t = prep(jnp.broadcast_to(m_a_t, (Ts, m_a_t.shape[1], H1))
                     .astype(dtype))
        m_d_t = prep(jnp.broadcast_to(m_d_t, (Ts, m_d_t.shape[1], H2))
                     .astype(dtype))
    else:
        m_a_t = jnp.zeros((n_steps, 8, 128), dtype)
        m_d_t = jnp.zeros((n_steps, 8, 128), dtype)
    maskadd = jnp.where(maskf > 0.5, 0.0, -1e9).astype(F32)

    # grid runs FORWARD over chunk indices; the index map reverses so chunk
    # i processes time block n_chunks-1-i (and the in-chunk loop runs its
    # steps highest-first)
    def rblk(shape):
        return pl.BlockSpec((chunk,) + shape,
                            lambda i: (n_chunks - 1 - i, 0, 0),
                            memory_space=pltpu.VMEM)

    def const(shape):
        n = len(shape)
        return pl.BlockSpec(shape, lambda i, n=n: (0,) * n,
                            memory_space=pltpu.VMEM)

    out_shapes = (
        jax.ShapeDtypeStruct((n_steps, B, 4 * H1), dtype),  # d_g_a
        jax.ShapeDtypeStruct((n_steps, B, 4 * H2), dtype),  # d_g_d
        jax.ShapeDtypeStruct((n_steps, B, E), dtype),       # d_ctx_total
        jax.ShapeDtypeStruct((n_steps, B, P), dtype),       # d_prenet
        jax.ShapeDtypeStruct((n_steps, B, T), F32),         # d_e
    )
    kernel = functools.partial(
        _bwd_kernel, chunk=chunk, norm=norm, dtype=dtype,
        use_dropout=use_dropout, loc_attn=loc_attn, P=P)
    outs = pl.pallas_call(
        kernel,
        grid=(n_chunks,),
        in_specs=[rblk((B, H2)), rblk((B, E)), rblk((B, T)),
                  rblk((B, 4 * H1)), rblk((B, 4 * H2)),
                  rblk((B, H1)), rblk((B, H2)),
                  rblk((B, H1)), rblk((B, H2)),
                  rblk((B, T)), rblk((B, T)),
                  rblk(m_a_t.shape[1:]), rblk(m_d_t.shape[1:]),
                  const((B, T, E)), const((B, T, A)), const((B, T))]
        + [const(w.shape) for w in weights],
        out_specs=tuple(rblk(s.shape[1:]) for s in out_shapes),
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((B, H1), F32), pltpu.VMEM((B, H1), F32),
            pltpu.VMEM((B, H2), F32), pltpu.VMEM((B, H2), F32),
            pltpu.VMEM((B, E), F32),
            pltpu.VMEM((B, T), F32), pltpu.VMEM((B, T), F32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=kernel_vmem_limit()),
    )(d_dech_t, d_ctx_o_t, d_align_o_t, g_a, g_d, c_a, c_d, c_a_p, c_d_p,
      att_p, cum_p, m_a_t, m_d_t, enc_out.astype(dtype),
      processed_inputs.astype(dtype), maskadd, *weights)

    return tuple(o[:Ts, :B0] for o in outs)
