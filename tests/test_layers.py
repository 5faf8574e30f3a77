"""Layer shape/behavior tests (reference tests/test_layers.py pattern)."""

import jax
import jax.numpy as jnp
import numpy as np

from your_voice_tts_tpu.nn import (
    BatchNorm1d, Conv1d, Dense, Embedding, GRUCell, LSTMCell, bilstm, gru, lstm,
)
from your_voice_tts_tpu.models.attention import GravesAttention, LocationSensitiveAttention
from your_voice_tts_tpu.models.common import Prenet, sequence_mask

KEY = jax.random.PRNGKey(0)


def test_dense():
    d = Dense(16, 32)
    p = d.init(KEY)
    y = d(p, jnp.ones((4, 16)))
    assert y.shape == (4, 32)


def test_embedding():
    e = Embedding(10, 8)
    p = e.init(KEY)
    y = e(p, jnp.array([[1, 2], [3, 4]]))
    assert y.shape == (2, 2, 8)


def test_conv1d_same_padding():
    c = Conv1d(8, 16, 5, padding="same")
    p = c.init(KEY)
    y = c(p, jnp.ones((2, 20, 8)))
    assert y.shape == (2, 20, 16)


def test_conv1d_matches_torch():
    """Cross-check our NWC conv against torch's conv1d on the same weights."""
    import torch

    c = Conv1d(4, 6, 5, padding="same")
    p = c.init(KEY)
    x = np.random.default_rng(0).standard_normal((2, 12, 4)).astype(np.float32)
    y = np.asarray(c(p, jnp.asarray(x)))
    w = np.asarray(p["w"])  # [k, in, out] -> torch [out, in, k]
    tw = torch.from_numpy(np.transpose(w, (2, 1, 0)).copy())
    tb = torch.from_numpy(np.asarray(p["b"]))
    ty = torch.nn.functional.conv1d(
        torch.from_numpy(x.transpose(0, 2, 1)), tw, tb, padding=2,
    ).numpy().transpose(0, 2, 1)
    np.testing.assert_allclose(y, ty, atol=1e-5)


def test_batchnorm_train_and_eval():
    bn = BatchNorm1d(8)
    p, s = bn.init(), bn.init_state()
    x = jax.random.normal(KEY, (4, 10, 8)) * 3 + 1
    y, s2 = bn(p, s, x, train=True)
    assert y.shape == x.shape
    assert abs(float(y.mean())) < 0.1
    assert not np.allclose(np.asarray(s2["mean"]), 0)
    y_eval, s3 = bn(p, s2, x, train=False)
    assert np.allclose(np.asarray(s3["mean"]), np.asarray(s2["mean"]))


def test_lstm_matches_torch():
    import torch

    cell = LSTMCell(6, 10)
    p = cell.init(KEY)
    x = np.random.default_rng(1).standard_normal((3, 7, 6)).astype(np.float32)
    ours = np.asarray(lstm(cell, p, jnp.asarray(x)))

    tcell = torch.nn.LSTM(6, 10, batch_first=True)
    sd = tcell.state_dict()
    sd["weight_ih_l0"] = torch.from_numpy(np.asarray(p["wx"]).T.copy())
    sd["weight_hh_l0"] = torch.from_numpy(np.asarray(p["wh"]).T.copy())
    sd["bias_ih_l0"] = torch.from_numpy(np.asarray(p["b"]))
    sd["bias_hh_l0"] = torch.zeros(40)
    tcell.load_state_dict(sd)
    theirs = tcell(torch.from_numpy(x))[0].detach().numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_gru_matches_torch():
    import torch

    cell = GRUCell(5, 8)
    p = cell.init(KEY)
    x = np.random.default_rng(2).standard_normal((2, 6, 5)).astype(np.float32)
    ours = np.asarray(gru(cell, p, jnp.asarray(x)))

    tcell = torch.nn.GRU(5, 8, batch_first=True)
    sd = tcell.state_dict()
    sd["weight_ih_l0"] = torch.from_numpy(np.asarray(p["wx"]).T.copy())
    sd["weight_hh_l0"] = torch.from_numpy(np.asarray(p["wh"]).T.copy())
    sd["bias_ih_l0"] = torch.from_numpy(np.asarray(p["bx"]))
    sd["bias_hh_l0"] = torch.from_numpy(np.asarray(p["bh"]))
    tcell.load_state_dict(sd)
    theirs = tcell(torch.from_numpy(x))[0].detach().numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_bilstm_masking():
    """Backward pass must be computed over the valid region only."""
    fwd, bwd = LSTMCell(4, 6), LSTMCell(4, 6)
    kf, kb = jax.random.split(KEY)
    pf, pb = fwd.init(kf), bwd.init(kb)
    x = jax.random.normal(KEY, (2, 10, 4))
    lengths = jnp.array([10, 6])
    out = bilstm(fwd, bwd, pf, pb, x, lengths)
    assert out.shape == (2, 10, 12)
    # sample 1 truncated to 6 == sample of length 6 processed alone
    out_solo = bilstm(fwd, bwd, pf, pb, x[1:2, :6], jnp.array([6]))
    np.testing.assert_allclose(np.asarray(out[1, :6]), np.asarray(out_solo[0]),
                               atol=1e-5)
    # padding positions are zeroed
    assert np.allclose(np.asarray(out[1, 6:]), 0)


def test_prenet_dropout_always_on():
    pre = Prenet(10, "original", True, (16, 16))
    p = pre.init(KEY)
    x = jnp.ones((4, 10))
    y1, _ = pre(p, {}, x, jax.random.PRNGKey(1), train=False)
    y2, _ = pre(p, {}, x, jax.random.PRNGKey(2), train=False)
    # dropout active even with train=False -> different outputs
    assert not np.allclose(np.asarray(y1), np.asarray(y2))


def test_location_attention_step():
    att = LocationSensitiveAttention(32, 24, 16)
    p = att.init(KEY)
    B, T = 3, 11
    inputs = jax.random.normal(KEY, (B, T, 24))
    proc = att.preprocess_inputs(p, inputs)
    state = att.init_state(B, T)
    mask = sequence_mask(jnp.array([11, 7, 4]), T)
    q = jax.random.normal(KEY, (B, 32))
    state, ctx, align = att(p, q, inputs, proc, state, mask)
    assert ctx.shape == (B, 24)
    assert align.shape == (B, T)
    np.testing.assert_allclose(np.asarray(align.sum(-1)), 1.0, atol=1e-5)
    # masked positions get zero attention
    assert np.allclose(np.asarray(align[2, 4:]), 0)
    assert np.allclose(np.asarray(state.attention_cum), np.asarray(align))


def test_forward_attention_monotonic_state():
    att = LocationSensitiveAttention(32, 24, 16, forward_attn=True, trans_agent=True)
    p = att.init(KEY)
    B, T = 2, 9
    inputs = jax.random.normal(KEY, (B, T, 24))
    proc = att.preprocess_inputs(p, inputs)
    state = att.init_state(B, T)
    q = jax.random.normal(KEY, (B, 32))
    state, ctx, align = att(p, q, inputs, proc, state, None)
    np.testing.assert_allclose(np.asarray(align.sum(-1)), 1.0, atol=1e-4)
    # alpha state propagates
    assert np.allclose(np.asarray(state.alpha), np.asarray(align))


def test_graves_attention_step():
    att = GravesAttention(32, K=4)
    p = att.init(KEY)
    B, T = 2, 13
    inputs = jax.random.normal(KEY, (B, T, 24))
    state = att.init_state(B, T)
    q = jax.random.normal(KEY, (B, 32))
    state, ctx, align = att(p, q, inputs, None, state, None)
    assert ctx.shape == (B, 24)
    np.testing.assert_allclose(np.asarray(align.sum(-1)), 1.0, atol=1e-4)
    # means moved forward
    assert np.all(np.asarray(state.mu) > 0)


def test_windowing_restricts_attention():
    att = LocationSensitiveAttention(32, 24, 16, windowing=True,
                                     win_back=1, win_front=2)
    p = att.init(KEY)
    B, T = 1, 15
    inputs = jax.random.normal(KEY, (B, T, 24))
    proc = att.preprocess_inputs(p, inputs)
    state = att.init_state(B, T)._replace(win_idx=jnp.array([5], jnp.int32))
    q = jax.random.normal(KEY, (B, 32))
    _, _, align = att(p, q, inputs, proc, state, None, inference=True)
    a = np.asarray(align[0])
    assert a[:4].max() == 0 and a[8:].max() == 0
    assert a[4:8].sum() > 0.99
