"""Custom-VJP decoder scan (models/decoder_grad.py) vs autodiff.

The fast teacher-forced path restructures the backward scan so weight
gradients become post-scan matmuls; these tests pin it to `jax.grad` of the
IDENTICAL forward (the core's autodiff twin), leaf by leaf, plus forward
equivalence against the original in-scan projection path.
"""

import dataclasses  # noqa: F401 (parity with sibling test modules)

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from your_voice_tts_tpu.config import ModelConfig
from your_voice_tts_tpu.models.common import sequence_mask
from your_voice_tts_tpu.models.decoder_grad import make_scan_core
from your_voice_tts_tpu.models.tacotron2 import Decoder

B, T_MEL, T_IN, E, R = 3, 12, 7, 16, 2


def _make(norm: str, location: bool) -> tuple[Decoder, dict]:
    cfg = ModelConfig(r=R, prenet_dim=8, attention_rnn_dim=12,
                      decoder_rnn_dim=20, attention_dim=10,
                      attention_location_filters=4,
                      attention_location_kernel_size=7,
                      attention_norm=norm, location_attn=location,
                      separate_stopnet=False)
    dec = Decoder(E, 5, R, cfg)
    return dec, dec.init(jax.random.PRNGKey(0))


def _inputs(dtype):
    rng = np.random.default_rng(1)
    mels = jnp.asarray(rng.normal(size=(B, T_MEL, 5)), dtype)
    enc = jnp.asarray(rng.normal(size=(B, T_IN, E)), dtype)
    lens = jnp.asarray([T_IN, T_IN - 2, T_IN - 3], jnp.int32)
    return mels, enc, lens


def _core_args(dec, p, mels, enc, lens, dropout, dtype):
    keys = (jax.random.split(jax.random.PRNGKey(3), T_MEL // R) if dropout
            else jnp.zeros((T_MEL // R, 2), jnp.uint32))
    maskf = sequence_mask(lens, T_IN).astype(jnp.float32)
    processed = dec.attention.preprocess_inputs(p["attention"], enc)
    last = mels[:, R - 1::R, :]
    go = jnp.zeros((B, 1, 5), dtype)
    pren, _ = dec.prenet(p["prenet"], {},
                         jnp.concatenate([go, last[:, :-1]], 1),
                         jax.random.PRNGKey(11), True)
    p_core = {"attention_rnn": p["attention_rnn"],
              "decoder_rnn": p["decoder_rnn"], "attention": p["attention"]}
    return p_core, jnp.swapaxes(pren, 0, 1), enc, processed, maskf, keys


@pytest.mark.parametrize("norm,location,dropout", [
    ("sigmoid", True, False),
    ("sigmoid", False, False),
    ("softmax", True, False),
    ("sigmoid", True, True),
])
def test_custom_vjp_matches_autodiff(norm, location, dropout):
    dec, p = _make(norm, location)
    mels, enc, lens = _inputs(jnp.float32)
    core = make_scan_core(dec, use_dropout=dropout)
    p_core, pren_t, enc, processed, maskf, keys = _core_args(
        dec, p, mels, enc, lens, dropout, jnp.float32)

    def agg(fn):
        def loss(p_core, pren_t, enc, processed):
            dh, cx, al = fn(p_core, pren_t, enc, processed, maskf, keys)
            return (jnp.sum(dh ** 2) + 0.7 * jnp.sum(cx ** 2)
                    + 0.3 * jnp.sum(al ** 2))
        return jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3)))

    g_fast = agg(core)(p_core, pren_t, enc, processed)
    g_ref = agg(core.plain)(p_core, pren_t, enc, processed)
    flat_f = jax.tree_util.tree_leaves(g_fast)
    flat_r = jax.tree_util.tree_leaves(g_ref)
    gscale = max(float(np.max(np.abs(np.asarray(x, np.float64))))
                 for x in flat_r)
    for a, b in zip(flat_f, flat_r):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        # denominator floored at 1% of the global grad scale: under softmax
        # normalization grad(v.b) is identically zero (shift invariance), so
        # both paths emit only cancellation noise for that leaf
        rel = np.max(np.abs(a - b)) / max(np.max(np.abs(b)), 1e-2 * gscale)
        assert rel < 2e-5, rel


def test_custom_vjp_bf16_grads_close():
    """Mixed-precision parity: bf16 compute, the mode the trainer runs."""
    dec, p = _make("sigmoid", True)
    p = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), p)
    mels, enc, lens = _inputs(jnp.bfloat16)
    core = make_scan_core(dec, use_dropout=False)
    p_core, pren_t, enc, processed, maskf, keys = _core_args(
        dec, p, mels, enc, lens, False, jnp.bfloat16)

    def agg(fn):
        def loss(p_core, pren_t, enc, processed):
            dh, cx, al = fn(p_core, pren_t, enc, processed, maskf, keys)
            return (jnp.sum(dh.astype(jnp.float32) ** 2)
                    + jnp.sum(cx.astype(jnp.float32) ** 2)
                    + jnp.sum(al ** 2))
        return jax.jit(jax.grad(loss, argnums=(0,)))

    g_fast = agg(core)(p_core, pren_t, enc, processed)
    g_ref = agg(core.plain)(p_core, pren_t, enc, processed)
    flat_f = jax.tree_util.tree_leaves(g_fast)
    flat_r = jax.tree_util.tree_leaves(g_ref)
    gscale = max(float(np.max(np.abs(np.asarray(x, np.float64))))
                 for x in flat_r)
    for a, b in zip(flat_f, flat_r):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        rel = np.max(np.abs(a - b)) / max(np.max(np.abs(b)), 1e-2 * gscale)
        assert rel < 0.08, rel  # bf16 rounding differs between the two
        # accumulation orders (ours sums whole-sequence in f32 — if anything
        # MORE accurate than the per-step bf16 carry)


def test_forward_path_equivalence():
    """Decoder.forward routes to the fast path and matches the in-scan
    projection path exactly when dropout is off (train=False)."""
    dec, p = _make("sigmoid", True)
    mels, enc, lens = _inputs(jnp.float32)
    assert dec.fast_grad_supported()
    out_f = dec.forward(p, {"prenet": {}}, enc, lens, mels, None,
                        train=False, r=R)
    dec.fast_grad = False
    try:
        out_s = dec.forward(p, {"prenet": {}}, enc, lens, mels, None,
                            train=False, r=R)
    finally:
        dec.fast_grad = True
    for a, b, name in zip(out_f[:3], out_s[:3], ("mel", "align", "stop")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=1e-5, err_msg=name)


def test_fast_grad_fallback_configs():
    """Forward attention / Graves route to the autodiff scan."""
    cfg = ModelConfig(r=R, prenet_dim=8, attention_rnn_dim=12,
                      decoder_rnn_dim=20, attention_dim=10,
                      use_forward_attn=True)
    dec = Decoder(E, 5, R, cfg)
    assert not dec.fast_grad_supported()
    cfg2 = ModelConfig(r=R, prenet_dim=8, attention_rnn_dim=12,
                       decoder_rnn_dim=20, attention_dim=10,
                       attention_type="graves")
    dec2 = Decoder(E, 5, R, cfg2)
    assert not dec2.fast_grad_supported()
    # and the supported default reports True
    dec3, _ = _make("sigmoid", True)
    assert dec3.fast_grad_supported()
