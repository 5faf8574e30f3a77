"""Teacher-forced decoder scan with a hand-written VJP.

Why this exists (measured on 1x TPU v5e, B=128 x 400 mel frames, r=2):
`jax.grad` through the decoder `lax.scan` accumulates every weight cotangent
in the backward loop's carry — ~36 MB of LSTM/attention weight gradients
read+written from HBM on EVERY one of the 200 reverse steps. That traffic is
~3x the unavoidable weight streaming, and the decoder backward alone owned
~30 ms of the ~63 ms device-side grad (`lax.scan(_split_transpose=True)` was
a wash: 69.6 vs 70.1 ms wall for the isolated decoder grad).

The restructure: the backward scan carries ONLY activation-sized cotangents
(d_h/d_c per LSTM, d_context, d_alignment, d_cum) and emits per-step gate
cotangents as stacked outputs; every large weight gradient then falls out as
ONE post-scan MXU matmul over the stacked sequence:

    dWx = X^T @ dGates      dWh = H_prev^T @ dGates      db = sum(dGates)

The attention-energy block (query/location/v projections — all small) is
differentiated per step with `jax.vjp` over the SAME
`LocationSensitiveAttention` methods the forward uses, so its numerics are
identical by construction; its weight cotangents accumulate in the carry
(~0.7 MB — noise next to the 36 MB the LSTMs no longer pay).

The projection and stopnet do not feed the recurrence under teacher forcing
(the next step's input is the ground-truth frame), so the caller hoists them
out of the scan entirely — see Decoder.forward (models/tacotron2.py), which
routes here for `original`-attention configs (with or without location
features, sigmoid or softmax normalization) and falls back to the autodiff
scan for forward-attention/Graves.

Reference parity anchor: this computes gradients of the reference's
layers/tacotron2.py Decoder teacher-forced loop (SURVEY.md SS3.1 inner hot
loop) — same math, restructured backward.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .attention import AttentionState

Params = dict[str, Any]
F32 = jnp.float32


def _zero_ct(x):
    """Cotangent for a non-differentiable (int/bool/key) primal."""
    if jnp.issubdtype(x.dtype, jnp.floating):
        return jnp.zeros_like(x)
    return np.zeros(x.shape, dtype=jax.dtypes.float0)


def _lstm_fwd(p, h, c, x):
    """One LSTM step returning (h', c', pre-activation gates)."""
    gates = jnp.dot(x, p["wx"]) + jnp.dot(h, p["wh"]) + p["b"]
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h = jax.nn.sigmoid(o) * jnp.tanh(c)
    return h, c, gates


def _lstm_bwd_local(gates, c_prev, c, d_h, d_c):
    """Backward through the gate nonlinearity from stored pre-activations.

    Returns (d_gates, d_c_prev). d_x / d_h_prev are the caller's matmuls
    against W^T (kept out of here so the weight reads happen exactly once).
    """
    gi, gf, gg, go = jnp.split(gates, 4, axis=-1)
    i, f, o = jax.nn.sigmoid(gi), jax.nn.sigmoid(gf), jax.nn.sigmoid(go)
    g = jnp.tanh(gg)
    tc = jnp.tanh(c)
    d_o = d_h * tc
    d_ct = d_c + d_h * o * (1.0 - tc * tc)
    d_gates = jnp.concatenate(
        [(d_ct * g) * i * (1.0 - i),
         (d_ct * c_prev) * f * (1.0 - f),
         (d_ct * i) * (1.0 - g * g),
         d_o * o * (1.0 - o)], axis=-1)
    return d_gates, d_ct * f


def _dropout_mask(key, keep: float, shape, dtype):
    return jnp.where(jax.random.bernoulli(key, keep, shape),
                     jnp.asarray(1.0 / keep, dtype), jnp.asarray(0.0, dtype))


def _shift(s):
    """stack[t] -> stack[t-1] (zeros at t=0) along the time axis 0."""
    return jnp.concatenate([jnp.zeros_like(s[:1]), s[:-1]], axis=0)


def _attention_param_grads(attention, p_att, q_t, att_prev_t, cum_prev_t,
                           processed_inputs, d_e_t, seg: int = 16):
    """Attention WEIGHT gradients from the per-step energy cotangents d_e_t.

    The energy block's parameter gradients are pure accumulations over steps
    (they never feed the recurrence), so they are recovered OUTSIDE the
    reverse scan by jax.vjp over the model's own `_energies` with whole time
    segments folded into the batch dimension — the same parameterization and
    numerics as the per-step vjp in the scan path, but MXU-batched. d_e_t is
    the cotangent of the RAW energies (zero at masked positions — the mask
    is a stop-gradient there), exactly what the Pallas backward kernel
    emits. Segmented (`seg` steps per vjp) to bound the [S*B, T, A]
    tanh-argument intermediate.
    """
    Ts, B, H = q_t.shape
    T_in = att_prev_t.shape[-1]
    dp_acc = jax.tree_util.tree_map(lambda x: jnp.zeros(x.shape, F32), p_att)
    d_pi_acc = jnp.zeros(processed_inputs.shape, F32)
    for s0 in range(0, Ts, seg):
        S = min(seg, Ts - s0)
        q_s = q_t[s0:s0 + S].reshape(S * B, H)
        att_s = att_prev_t[s0:s0 + S].reshape(S * B, T_in)
        cum_s = cum_prev_t[s0:s0 + S].reshape(S * B, T_in)
        d_e_s = d_e_t[s0:s0 + S].reshape(S * B, T_in).astype(F32)

        def efn(pa, pi, att_s=att_s, cum_s=cum_s, q_s=q_s, S=S):
            st = AttentionState(attention=att_s, attention_cum=cum_s,
                                alpha=att_s, win_idx=None, mu=None)
            pi_b = jnp.broadcast_to(pi[None], (S,) + pi.shape).reshape(
                (S * B,) + pi.shape[1:])
            return attention._energies(pa, q_s, pi_b, st).astype(F32)

        _, pull = jax.vjp(efn, p_att, processed_inputs)
        dpa, dpi = pull(d_e_s)
        dp_acc = jax.tree_util.tree_map(
            lambda a, b: a + b.astype(F32), dp_acc, dpa)
        d_pi_acc = d_pi_acc + dpi.astype(F32)
    return dp_acc, d_pi_acc


def _train_kernel_plan(decoder, prenet_t, enc_out, use_dropout: bool):
    """Route the teacher-forced scan onto the Pallas training kernels
    (ops/pallas/taco2_train.py) when running on TPU and the working set fits
    VMEM (ops/pallas/capacity.taco2_train_plan). Returns {"chunk_fwd": n,
    "chunk_bwd": m, "interpret": bool} or None (XLA scan).
    `decoder.train_kernel = False` disables; `decoder.train_kernel_interpret
    = True` forces the kernel in interpret mode on any backend (tests)."""
    if not getattr(decoder, "train_kernel", True):
        return None
    interpret = bool(getattr(decoder, "train_kernel_interpret", False))
    if not interpret and jax.default_backend() != "tpu":
        return None
    from ..ops.pallas.capacity import taco2_train_plan
    T_steps, B, P = prenet_t.shape
    plan = taco2_train_plan(
        T=enc_out.shape[1], B=B, E=enc_out.shape[2],
        A=decoder.attention.query_layer.out_dim,
        H1=decoder.attention_rnn.hidden, H2=decoder.decoder_rnn.hidden,
        P=P, dtype_bytes=prenet_t.dtype.itemsize, dropout=use_dropout)
    if plan is None:
        return None
    plan["interpret"] = interpret
    return plan


def make_scan_core(decoder, use_dropout: bool):
    """Return the custom-VJP teacher-forced scan core for `decoder`.

    Signature of the returned fn:
      (p_core, prenet_t, enc_out, processed_inputs, maskf, keys)
        -> (dech_t, ctx_t, align_t)
    with p_core = {"attention_rnn", "decoder_rnn", "attention"},
    prenet_t [T, B, P], enc_out [B, T_in, E], processed_inputs [B, T_in, A],
    maskf [B, T_in] float (1 = valid), keys [T, ...] per-step dropout keys
    (ignored when use_dropout is False). Outputs: dech_t [T, B, D]
    (post-dropout decoder hidden), ctx_t [T, B, E], align_t [T, B, T_in] f32.
    """
    cache = decoder.__dict__.setdefault("_scan_core_cache", {})
    if use_dropout in cache:
        return cache[use_dropout]

    attention = decoder.attention
    keep = 1.0 - decoder.P_DROPOUT
    H_A = decoder.attention_rnn.hidden
    H_D = decoder.decoder_rnn.hidden

    def align_step(p_att, query, att_prev, cum_prev, processed_inputs, maskf):
        """One step's alignment via the SAME attention methods as the autodiff
        path (windowing is inference-only; forward attention is routed to the
        fallback scan by the caller)."""
        st = AttentionState(attention=att_prev, attention_cum=cum_prev,
                            alpha=att_prev, win_idx=None, mu=None)
        e = attention._energies(p_att, query, processed_inputs, st)
        return attention._normalize(e, maskf > 0.5)

    def _masks(keys, B, dtype):
        """Per-step dropout multipliers [T, B, H] (or broadcastable ones)."""
        if not use_dropout:
            one = jnp.ones((keys.shape[0], 1, 1), dtype)
            return one, one

        def of(key_t):
            k1, k2 = jax.random.split(key_t)
            return (_dropout_mask(k1, keep, (B, H_A), dtype),
                    _dropout_mask(k2, keep, (B, H_D), dtype))

        return jax.vmap(of)(keys)

    def fwd_scan(p_core, prenet_t, enc_out, processed_inputs, maskf, keys):
        B = prenet_t.shape[1]
        T_in = enc_out.shape[1]
        dtype = prenet_t.dtype
        p_att = p_core["attention"]
        m_a_t, m_d_t = _masks(keys, B, dtype)

        def step(carry, xs):
            (h_a, c_a, h_d, c_d, ctx, att, cum) = carry
            x_t, m_a, m_d = xs
            attn_in = jnp.concatenate([x_t, ctx], axis=-1)
            h_a2, c_a2, g_a = _lstm_fwd(p_core["attention_rnn"], h_a, c_a,
                                        attn_in)
            q = h_a2 * m_a
            align = align_step(p_att, q, att, cum, processed_inputs, maskf)
            ctx2 = jnp.einsum("bt,bte->be", align, enc_out).astype(dtype)
            dec_in = jnp.concatenate([q, ctx2], axis=-1)
            h_d2, c_d2, g_d = _lstm_fwd(p_core["decoder_rnn"], h_d, c_d,
                                        dec_in)
            carry2 = (h_a2, c_a2, h_d2, c_d2, ctx2, align, cum + align)
            return carry2, (h_d2 * m_d, ctx2, align, g_a, g_d, c_a2, c_d2)

        z = jnp.zeros
        carry0 = (z((B, H_A), dtype), z((B, H_A), dtype),
                  z((B, H_D), dtype), z((B, H_D), dtype),
                  z((B, enc_out.shape[2]), dtype),
                  z((B, T_in), F32), z((B, T_in), F32))
        _, ys = lax.scan(step, carry0, (prenet_t, m_a_t, m_d_t))
        return ys  # (dech_t, ctx_t, align_t, gates_a, gates_d, c_a, c_d)

    def core(p_core, prenet_t, enc_out, processed_inputs, maskf, keys):
        dech_t, ctx_t, align_t, *_ = fwd_scan(
            p_core, prenet_t, enc_out, processed_inputs, maskf, keys)
        return dech_t, ctx_t, align_t

    core_vjp = jax.custom_vjp(core)

    def core_fwd(p_core, prenet_t, enc_out, processed_inputs, maskf, keys):
        plan = _train_kernel_plan(decoder, prenet_t, enc_out, use_dropout)
        if plan is not None:
            from ..ops.pallas.taco2_train import taco2_train_fwd_pallas
            if use_dropout:
                m_a_t, m_d_t = _masks(keys, prenet_t.shape[1], prenet_t.dtype)
            else:
                m_a_t = m_d_t = None
            ys = taco2_train_fwd_pallas(
                p_core, prenet_t, enc_out, processed_inputs, maskf,
                m_a_t, m_d_t, norm=attention.norm,
                loc_attn=attention.location_attention,
                chunk=plan["chunk_fwd"], interpret=plan["interpret"])
        else:
            ys = fwd_scan(p_core, prenet_t, enc_out, processed_inputs, maskf,
                          keys)
        dech_t, ctx_t, align_t, g_a, g_d, c_a, c_d = ys
        res = (p_core, prenet_t, enc_out, processed_inputs, maskf, keys,
               ctx_t, align_t, g_a, g_d, c_a, c_d)
        return (dech_t, ctx_t, align_t), res

    def core_bwd(res, cts):
        (p_core, prenet_t, enc_out, processed_inputs, maskf, keys,
         ctx_t, align_t, g_a, g_d, c_a, c_d) = res
        d_dech_t, d_ctx_out_t, d_align_out_t = cts
        T, B, P = prenet_t.shape
        T_in, E = enc_out.shape[1], enc_out.shape[2]
        dtype = prenet_t.dtype
        p_att = p_core["attention"]
        wx_a, wh_a = p_core["attention_rnn"]["wx"], p_core["attention_rnn"]["wh"]
        wx_d, wh_d = p_core["decoder_rnn"]["wx"], p_core["decoder_rnn"]["wh"]

        # cheap elementwise recomputation, once, outside the reverse scan
        h_a_pre = jax.nn.sigmoid(g_a[..., 3 * H_A:]) * jnp.tanh(c_a)
        m_a_t, m_d_t = _masks(keys, B, dtype)
        q_t = h_a_pre * m_a_t                       # post-dropout queries
        c_a_prev, c_d_prev = _shift(c_a), _shift(c_d)
        ctx_prev_t = _shift(ctx_t)
        cum_prev_t = _shift(jnp.cumsum(align_t, axis=0))
        att_prev_t = _shift(align_t)

        def _weight_grads(d_g_a_t, d_g_d_t, d_ctx_t, d_prenet_t,
                          dp_att_acc, d_pi_acc):
            # ---- weight gradients as single whole-sequence matmuls ----
            TB = T * B
            flat = lambda a: a.reshape(TB, a.shape[-1])  # noqa: E731

            def mm(a, b):
                return jnp.dot(flat(a).T, flat(b), preferred_element_type=F32)

            x_a = jnp.concatenate([prenet_t, ctx_prev_t], axis=-1)
            h_a_prev = _shift(h_a_pre)
            x_d = jnp.concatenate([q_t, ctx_t], axis=-1)
            h_d_prev = _shift(jax.nn.sigmoid(g_d[..., 3 * H_D:])
                              * jnp.tanh(c_d))

            p_a, p_d = p_core["attention_rnn"], p_core["decoder_rnn"]
            d_attn_rnn = {"wx": mm(x_a, d_g_a_t).astype(p_a["wx"].dtype),
                          "wh": mm(h_a_prev, d_g_a_t).astype(p_a["wh"].dtype),
                          "b": jnp.sum(flat(d_g_a_t).astype(F32),
                                       0).astype(p_a["b"].dtype)}
            d_dec_rnn = {"wx": mm(x_d, d_g_d_t).astype(p_d["wx"].dtype),
                         "wh": mm(h_d_prev, d_g_d_t).astype(p_d["wh"].dtype),
                         "b": jnp.sum(flat(d_g_d_t).astype(F32),
                                      0).astype(p_d["b"].dtype)}
            dp_att_final = jax.tree_util.tree_map(
                lambda acc, p: acc.astype(p.dtype), dp_att_acc, p_att)

            # d_enc_out: the context path (sum_t align_t (x) d_ctx_t); the
            # processed-inputs path returns separately and the caller's
            # autodiff routes it back through attention.inputs_layer.
            d_enc = jnp.einsum("tbi,tbe->bie", align_t,
                               d_ctx_t.astype(F32)).astype(enc_out.dtype)

            d_p_core = {"attention_rnn": d_attn_rnn, "decoder_rnn": d_dec_rnn,
                        "attention": dp_att_final}
            return (d_p_core, d_prenet_t, d_enc,
                    d_pi_acc.astype(processed_inputs.dtype),
                    jnp.zeros_like(maskf), _zero_ct(keys))

        plan = _train_kernel_plan(decoder, prenet_t, enc_out, use_dropout)
        if plan is not None:
            from ..ops.pallas.taco2_train import taco2_train_bwd_pallas
            residuals = {"g_a": g_a, "g_d": g_d, "c_a": c_a, "c_d": c_d,
                         "c_a_prev": c_a_prev, "c_d_prev": c_d_prev,
                         "att_prev": att_prev_t, "cum_prev": cum_prev_t}
            (d_g_a_t, d_g_d_t, d_ctx_t, d_prenet_t,
             d_e_t) = taco2_train_bwd_pallas(
                p_core, residuals,
                (d_dech_t, d_ctx_out_t.astype(dtype), d_align_out_t),
                enc_out, processed_inputs, maskf,
                m_a_t if use_dropout else None,
                m_d_t if use_dropout else None,
                P=P, norm=attention.norm,
                loc_attn=attention.location_attention,
                chunk=plan["chunk_bwd"], interpret=plan["interpret"])
            # attention WEIGHT grads + d_pinp: one batched vjp over the
            # model's own _energies with all steps folded into the batch dim
            # (pure accumulations over steps -> recoverable outside the
            # recurrence, MXU-batched instead of serial)
            dp_att_acc, d_pi_acc = _attention_param_grads(
                attention, p_att, q_t, att_prev_t, cum_prev_t,
                processed_inputs, d_e_t)
            return _weight_grads(d_g_a_t, d_g_d_t, d_ctx_t, d_prenet_t,
                                 dp_att_acc, d_pi_acc)

        dp_att_zero = jax.tree_util.tree_map(
            lambda x: jnp.zeros(x.shape, F32), p_att)

        def step(carry, xs):
            (d_h_a, d_c_a, d_h_d, d_c_d, d_ctx_carry, d_att_carry,
             d_cum_carry, dp_att_acc, d_pi_acc) = carry
            (d_hd_out, d_ctx_out, d_align_out, g_a_t, g_d_t, c_a_t, c_d_t,
             c_a_p, c_d_p, att_p, cum_p, q, m_a, m_d, align) = xs

            # decoder LSTM (reverse)
            d_h_d_pre = d_h_d + d_hd_out * m_d
            d_g_d, d_c_d_prev = _lstm_bwd_local(g_d_t, c_d_p, c_d_t,
                                                d_h_d_pre, d_c_d)
            d_x_d = jnp.dot(d_g_d, wx_d.T)
            d_h_d_next = jnp.dot(d_g_d, wh_d.T)
            d_q = d_x_d[:, :H_A]
            d_ctx_total = (d_ctx_out + d_x_d[:, H_A:]
                           + d_ctx_carry).astype(F32)

            # context = align @ enc_out
            d_align_from_ctx = jnp.einsum("be,bte->bt", d_ctx_total,
                                          enc_out.astype(F32))
            d_align_total = (d_align_out + d_align_from_ctx
                             + d_att_carry + d_cum_carry)

            # alignment block: vjp over the forward's own attention methods
            _, pull = jax.vjp(align_step, p_att, q, att_p, cum_p,
                              processed_inputs, maskf)
            dp_att, d_q2, d_att_prev, d_cum_prev, d_pi, _ = pull(
                d_align_total.astype(F32))
            dp_att_acc = jax.tree_util.tree_map(
                lambda a, b: a + b.astype(F32), dp_att_acc, dp_att)
            d_pi_acc = d_pi_acc + d_pi.astype(F32)

            # attention LSTM (reverse)
            d_h_a_pre = d_h_a + (d_q + d_q2.astype(d_q.dtype)) * m_a
            d_g_a, d_c_a_prev = _lstm_bwd_local(g_a_t, c_a_p, c_a_t,
                                                d_h_a_pre, d_c_a)
            d_x_a = jnp.dot(d_g_a, wx_a.T)
            d_h_a_next = jnp.dot(d_g_a, wh_a.T)

            carry2 = (d_h_a_next, d_c_a_prev, d_h_d_next, d_c_d_prev,
                      d_x_a[:, P:], d_att_prev, d_cum_carry + d_cum_prev,
                      dp_att_acc, d_pi_acc)
            return carry2, (d_g_a, d_g_d, d_ctx_total.astype(dtype),
                            d_x_a[:, :P])

        z = jnp.zeros
        carry0 = (z((B, H_A), dtype), z((B, H_A), dtype),
                  z((B, H_D), dtype), z((B, H_D), dtype),
                  z((B, E), dtype), z((B, T_in), F32), z((B, T_in), F32),
                  dp_att_zero, z(processed_inputs.shape, F32))
        xs = (d_dech_t, d_ctx_out_t, d_align_out_t, g_a, g_d, c_a, c_d,
              c_a_prev, c_d_prev, att_prev_t, cum_prev_t, q_t, m_a_t, m_d_t,
              align_t)
        carry_out, (d_g_a_t, d_g_d_t, d_ctx_t, d_prenet_t) = lax.scan(
            step, carry0, xs, reverse=True)
        dp_att_acc, d_pi_acc = carry_out[7], carry_out[8]
        return _weight_grads(d_g_a_t, d_g_d_t, d_ctx_t, d_prenet_t,
                             dp_att_acc, d_pi_acc)

    core_vjp.defvjp(core_fwd, core_bwd)
    core_vjp.plain = core  # autodiff twin of the same forward (grad tests)
    cache[use_dropout] = core_vjp
    return core_vjp
