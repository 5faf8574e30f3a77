"""Pallas teacher-forced training kernels (ops/pallas/taco2_train.py).

The forward kernel must reproduce decoder_grad.fwd_scan's stacks, and the
fully-routed custom-VJP (kernel forward + kernel reverse scan + batched
energies-vjp for attention weight grads) must reproduce `jax.grad` of the
identical forward — the same leaf-by-leaf pinning discipline as
tests/test_decoder_grad.py. Kernels run in interpret mode here (CPU suite);
`bench.py --verify` exercises the Mosaic lowering on the real TPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from your_voice_tts_tpu.config import ModelConfig
from your_voice_tts_tpu.models.common import sequence_mask
from your_voice_tts_tpu.models.decoder_grad import make_scan_core
from your_voice_tts_tpu.models.tacotron2 import Decoder
from your_voice_tts_tpu.ops.pallas.capacity import taco2_train_plan
from your_voice_tts_tpu.ops.pallas.taco2_train import taco2_train_fwd_pallas

# 7 scan steps: chunk=4 exercises the zero-padded tail chunk; B=3 exercises
# the sublane batch padding
B, T_MEL, T_IN, E, R = 3, 14, 7, 16, 2


def _make(norm: str, location: bool, dtype=jnp.float32):
    cfg = ModelConfig(r=R, prenet_dim=8, attention_rnn_dim=12,
                      decoder_rnn_dim=20, attention_dim=10,
                      attention_location_filters=4,
                      attention_location_kernel_size=7,
                      attention_norm=norm, location_attn=location,
                      separate_stopnet=False)
    dec = Decoder(E, 5, R, cfg)
    p = dec.init(jax.random.PRNGKey(0))
    if dtype != jnp.float32:
        p = jax.tree_util.tree_map(lambda x: x.astype(dtype), p)
    rng = np.random.default_rng(1)
    mels = jnp.asarray(rng.normal(size=(B, T_MEL, 5)), dtype)
    enc = jnp.asarray(rng.normal(size=(B, T_IN, E)), dtype)
    lens = jnp.asarray([T_IN, T_IN - 2, T_IN - 3], jnp.int32)
    maskf = sequence_mask(lens, T_IN).astype(jnp.float32)
    processed = dec.attention.preprocess_inputs(p["attention"], enc)
    last = mels[:, R - 1::R, :]
    go = jnp.zeros((B, 1, 5), dtype)
    pren, _ = dec.prenet(p["prenet"], {},
                         jnp.concatenate([go, last[:, :-1]], 1),
                         jax.random.PRNGKey(11), True)
    p_core = {"attention_rnn": p["attention_rnn"],
              "decoder_rnn": p["decoder_rnn"], "attention": p["attention"]}
    return dec, p_core, jnp.swapaxes(pren, 0, 1), enc, processed, maskf


def _grad_check(dec, p_core, pren_t, enc, processed, maskf, dropout, tol):
    keys = (jax.random.split(jax.random.PRNGKey(3), T_MEL // R) if dropout
            else jnp.zeros((T_MEL // R, 2), jnp.uint32))
    dec.train_kernel_interpret = True   # route to the kernels on any backend
    core = make_scan_core(dec, use_dropout=dropout)

    def agg(fn):
        def loss(p_core, pren_t, enc, processed):
            dh, cx, al = fn(p_core, pren_t, enc, processed, maskf, keys)
            return (jnp.sum(dh.astype(jnp.float32) ** 2)
                    + 0.7 * jnp.sum(cx.astype(jnp.float32) ** 2)
                    + 0.3 * jnp.sum(al ** 2))
        return jax.grad(loss, argnums=(0, 1, 2, 3))

    g_fast = agg(core)(p_core, pren_t, enc, processed)
    g_ref = agg(core.plain)(p_core, pren_t, enc, processed)
    flat_f = jax.tree_util.tree_leaves(g_fast)
    flat_r = jax.tree_util.tree_leaves(g_ref)
    gscale = max(float(np.max(np.abs(np.asarray(x, np.float64))))
                 for x in flat_r)
    for a, b in zip(flat_f, flat_r):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        rel = np.max(np.abs(a - b)) / max(np.max(np.abs(b)), 1e-2 * gscale)
        assert rel < tol, rel


def test_fwd_kernel_matches_fwd_scan():
    dec, p_core, pren_t, enc, processed, maskf = _make("sigmoid", True)
    keys = jnp.zeros((T_MEL // R, 2), jnp.uint32)
    core = make_scan_core(dec, use_dropout=False)
    ref = core.plain(p_core, pren_t, enc, processed, maskf, keys)
    ker = taco2_train_fwd_pallas(p_core, pren_t, enc, processed, maskf,
                                 None, None, norm="sigmoid", loc_attn=True,
                                 chunk=4, interpret=True)
    for name, a, b in zip(("dech", "ctx", "align"), ker[:3], ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                    rtol=0, atol=1e-5, err_msg=name)


@pytest.mark.parametrize("norm,location,dropout", [
    ("sigmoid", True, False),
    ("softmax", True, False),
    ("sigmoid", False, False),
    ("sigmoid", True, True),
])
def test_kernel_grads_match_autodiff(norm, location, dropout):
    dec, p_core, pren_t, enc, processed, maskf = _make(norm, location)
    _grad_check(dec, p_core, pren_t, enc, processed, maskf, dropout, 2e-5)


def test_kernel_grads_bf16():
    dec, p_core, pren_t, enc, processed, maskf = _make(
        "sigmoid", True, jnp.bfloat16)
    _grad_check(dec, p_core, pren_t, enc, processed, maskf, False, 0.08)


def test_train_plan_routing():
    """The capacity plan admits the production shape on a 128MiB-VMEM device
    and refuses it on a 16MiB one (v2/v3 -> XLA scan fallback)."""
    kw = dict(T=128, B=128, E=512, A=128, H1=1024, H2=1024, P=256,
              dtype_bytes=2, dropout=True)
    plan = taco2_train_plan(**kw, device_kind="TPU v5 lite")
    assert plan is not None and plan["chunk_fwd"] >= 1
    # the backward's per-step [B,T,A] f32 intermediates are ~2x the
    # forward's: its chunk can never exceed the forward's
    assert plan["chunk_bwd"] <= plan["chunk_fwd"]
    assert taco2_train_plan(**kw, device_kind="TPU v3") is None
    # f32 at a long text on a small device must also fall back
    assert taco2_train_plan(T=512, B=256, E=512, A=128, H1=1024, H2=1024,
                            P=256, dtype_bytes=4, dropout=True,
                            device_kind="TPU v3") is None


def test_kernel_routing_off_tpu_defaults_to_scan():
    """Without the interpret override, a CPU backend routes to the XLA scan
    (train_kernel_plan returns None), keeping CI paths kernel-free."""
    from your_voice_tts_tpu.models.decoder_grad import _train_kernel_plan
    dec, p_core, pren_t, enc, processed, maskf = _make("sigmoid", True)
    assert not getattr(dec, "train_kernel_interpret", False)
    if jax.default_backend() != "tpu":
        assert _train_kernel_plan(dec, pren_t, enc, False) is None
    dec.train_kernel = False
    dec.train_kernel_interpret = True
    assert _train_kernel_plan(dec, pren_t, enc, False) is None
