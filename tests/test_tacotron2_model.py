"""Tacotron2 model tests — the reference's pattern (tests/test_tacotron2_model.py):
build from a small config, random batches, a few train steps, assert loss
decreases and EVERY parameter changed (param-delta sweep), plus inference
shape/stop behavior. SURVEY.md SS4."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from your_voice_tts_tpu.config import Config, ModelConfig, config_from_dict
from your_voice_tts_tpu.models.losses import TacotronLoss
from your_voice_tts_tpu.models.tacotron2 import Tacotron2

SMALL = ModelConfig(
    r=2, embedding_dim=32, encoder_dim=32, decoder_rnn_dim=48,
    attention_rnn_dim=48, attention_dim=24, attention_location_filters=8,
    attention_location_kernel_size=15, prenet_dim=24, postnet_dim=32,
    max_decoder_steps=20,
)
N_MELS = 20
NUM_CHARS = 30


def make_batch(key, B=4, T_text=12, T_mel=16):
    k1, k2 = jax.random.split(key)
    text = jax.random.randint(k1, (B, T_text), 1, NUM_CHARS)
    text_len = jnp.array(sorted([T_text, T_text - 2, T_text - 4, T_text - 5],
                                reverse=True)[:B])
    mels = jax.random.normal(k2, (B, T_mel, N_MELS))
    mel_len = jnp.array([T_mel, T_mel, T_mel - 2, T_mel - 4][:B])
    stop_targets = (jnp.arange(T_mel // SMALL.r)[None, :] >=
                    (mel_len[:, None] // SMALL.r - 1)).astype(jnp.float32)
    return text, text_len, mels, mel_len, stop_targets


@pytest.fixture(scope="module")
def model():
    return Tacotron2(NUM_CHARS, SMALL, n_mels=N_MELS)


@pytest.fixture(scope="module")
def variables(model):
    return model.init(jax.random.PRNGKey(0))


def test_forward_shapes(model, variables):
    text, text_len, mels, mel_len, _ = make_batch(jax.random.PRNGKey(1))
    out = model.forward(variables, text, text_len, mels,
                        rng=jax.random.PRNGKey(2), train=True)
    B, T_mel = mels.shape[:2]
    assert out["decoder_outputs"].shape == (B, T_mel, N_MELS)
    assert out["postnet_outputs"].shape == (B, T_mel, N_MELS)
    assert out["alignments"].shape == (B, T_mel // SMALL.r, text.shape[1])
    assert out["stop_logits"].shape == (B, T_mel // SMALL.r)
    a = np.asarray(out["alignments"])
    np.testing.assert_allclose(a.sum(-1), 1.0, atol=1e-4)
    # attention over padded text positions must be zero
    assert np.allclose(a[-1, :, int(text_len[-1]):], 0)


def test_train_loop_loss_decreases_and_all_params_update(model, variables):
    criterion = TacotronLoss("Tacotron2", ga_alpha=5.0)
    optimizer = optax.adam(1e-3)

    params0 = variables["params"]
    state0 = variables["state"]
    opt_state = optimizer.init(params0)

    def loss_fn(params, state, batch, rng):
        text, text_len, mels, mel_len, stop_t = batch
        out = model.forward({"params": params, "state": state}, text, text_len,
                            mels, rng=rng, train=True)
        total, parts = criterion(out, mels, mel_len, stop_t, text_len, r=SMALL.r)
        return total, (out["state"], parts)

    @jax.jit
    def train_step(params, state, opt_state, batch, rng):
        (loss, (new_state, _)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, state, batch, rng)
        updates, opt_state = optimizer.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return params, new_state, opt_state, loss

    batch = make_batch(jax.random.PRNGKey(3))
    params, state = params0, state0
    losses = []
    # fixed dropout rng -> deterministic objective, so the decrease check is
    # meaningful after few steps (fresh rng per step is too noisy for 5 steps)
    rng = jax.random.PRNGKey(10)
    for _ in range(8):
        params, state, opt_state, loss = train_step(
            params, state, opt_state, batch, rng)
        losses.append(float(loss))
    assert losses[-1] < losses[0], f"loss did not decrease: {losses}"

    # the reference's param-delta sweep: every parameter must have changed
    flat0 = jax.tree_util.tree_leaves_with_path(params0)
    flat1 = {jax.tree_util.keystr(k): v for k, v in
             jax.tree_util.tree_leaves_with_path(params)}
    unchanged = [jax.tree_util.keystr(k) for k, v in flat0
                 if np.allclose(np.asarray(v),
                                np.asarray(flat1[jax.tree_util.keystr(k)]))]
    assert not unchanged, f"params never updated: {unchanged}"


def test_inference_shapes_and_stop(model, variables):
    text, text_len, _, _, _ = make_batch(jax.random.PRNGKey(4))
    out = model.inference(variables, text, text_len, rng=jax.random.PRNGKey(5))
    B = text.shape[0]
    T_out = SMALL.max_decoder_steps * SMALL.r
    assert out["postnet_outputs"].shape == (B, T_out, N_MELS)
    assert out["alignments"].shape == (B, SMALL.max_decoder_steps, text.shape[1])
    assert out["stop_probs"].shape == (B, SMALL.max_decoder_steps)
    lens = np.asarray(out["mel_lengths"])
    assert lens.shape == (B,)
    assert np.all(lens >= SMALL.r) and np.all(lens <= T_out)


def test_inference_deterministic_encoder_path(model, variables):
    """Without rng, inference is fully deterministic (prenet dropout off)."""
    text, text_len, _, _, _ = make_batch(jax.random.PRNGKey(6))
    o1 = model.inference(variables, text, text_len, rng=None)
    o2 = model.inference(variables, text, text_len, rng=None)
    np.testing.assert_allclose(np.asarray(o1["postnet_outputs"]),
                               np.asarray(o2["postnet_outputs"]))


def test_multispeaker_internal_embedding():
    model = Tacotron2(NUM_CHARS, SMALL, n_mels=N_MELS, num_speakers=5,
                      speaker_embedding_dim=16)
    # external embedding mode: pass d-vectors
    variables = model.init(jax.random.PRNGKey(0))
    text, text_len, mels, mel_len, stop_t = make_batch(jax.random.PRNGKey(7))
    d_vectors = jax.random.normal(jax.random.PRNGKey(8), (text.shape[0], 16))
    out = model.forward(variables, text, text_len, mels,
                        rng=jax.random.PRNGKey(9), train=True,
                        speaker_embeddings=d_vectors)
    assert out["postnet_outputs"].shape == mels.shape
    # different speakers must change the output
    d2 = jax.random.normal(jax.random.PRNGKey(10), (text.shape[0], 16))
    out2 = model.forward(variables, text, text_len, mels,
                         rng=jax.random.PRNGKey(9), train=True,
                         speaker_embeddings=d2)
    assert not np.allclose(np.asarray(out["postnet_outputs"]),
                           np.asarray(out2["postnet_outputs"]))


def test_multispeaker_lookup_table():
    model = Tacotron2(NUM_CHARS, SMALL, n_mels=N_MELS, num_speakers=5,
                      speaker_embedding_dim=0)
    variables = model.init(jax.random.PRNGKey(0))
    assert "speaker_embedding" in variables["params"]
    text, text_len, mels, mel_len, _ = make_batch(jax.random.PRNGKey(7))
    ids = jnp.array([0, 1, 2, 3])
    out = model.forward(variables, text, text_len, mels,
                        rng=jax.random.PRNGKey(9), train=True, speaker_ids=ids)
    assert out["postnet_outputs"].shape == mels.shape


def test_gst_model():
    model = Tacotron2(NUM_CHARS, SMALL, n_mels=N_MELS, use_gst=True)
    variables = model.init(jax.random.PRNGKey(0))
    assert "gst" in variables["params"]
    text, text_len, mels, mel_len, _ = make_batch(jax.random.PRNGKey(7))
    out = model.forward(variables, text, text_len, mels,
                        rng=jax.random.PRNGKey(9), train=True)
    assert out["postnet_outputs"].shape == mels.shape
    # style conditioning at inference
    inf = model.inference(variables, text, text_len, style_mel=mels)
    assert inf["postnet_outputs"].shape[0] == text.shape[0]


def test_loss_components():
    criterion = TacotronLoss("Tacotron2", ga_alpha=10.0)
    B, T_mel, T_text = 2, 8, 6
    r = 2
    out = {
        "decoder_outputs": jnp.zeros((B, T_mel, N_MELS)),
        "postnet_outputs": jnp.zeros((B, T_mel, N_MELS)),
        "alignments": jnp.full((B, T_mel // r, T_text), 1.0 / T_text),
        "stop_logits": jnp.zeros((B, T_mel // r)),
    }
    mels = jnp.ones((B, T_mel, N_MELS))
    total, parts = criterion(out, mels, jnp.array([T_mel, T_mel - 2]),
                             jnp.zeros((B, T_mel // r)), jnp.array([T_text, 4]),
                             r=r)
    assert float(parts["decoder_loss"]) == pytest.approx(1.0, abs=1e-5)
    assert float(total) > float(parts["decoder_loss"])
    assert "ga_loss" in parts and float(parts["ga_loss"]) > 0


def test_bidirectional_decoder():
    import dataclasses

    cfg = dataclasses.replace(SMALL, bidirectional_decoder=True)
    model = Tacotron2(NUM_CHARS, cfg, n_mels=N_MELS)
    variables = model.init(jax.random.PRNGKey(0))
    assert "decoder_backward" in variables["params"]
    text, text_len, mels, mel_len, stop_t = make_batch(jax.random.PRNGKey(11))
    out = model.forward(variables, text, text_len, mels,
                        rng=jax.random.PRNGKey(12), train=True)
    assert out["decoder_backward_outputs"].shape == mels.shape
    criterion = TacotronLoss("Tacotron2")
    total, parts = criterion(out, mels, mel_len, stop_t, text_len, r=SMALL.r)
    assert "decoder_b_loss" in parts and "decoder_c_loss" in parts
    assert np.isfinite(float(total))
    # inference ignores the backward decoder
    inf = model.inference(variables, text, text_len)
    assert inf["postnet_outputs"].shape[0] == text.shape[0]


def test_inference_incremental_matches_full(model, variables):
    """Chunked early-exit decode must produce the same outputs as the one-shot
    scan over the steps it runs (deterministic, rng=None)."""
    text, text_len, _, _, _ = make_batch(jax.random.PRNGKey(20))
    full = model.inference(variables, text, text_len, rng=None)
    inc = model.inference_incremental(variables, text, text_len, rng=None,
                                      chunk_steps=5)
    T = min(inc["postnet_outputs"].shape[1], full["postnet_outputs"].shape[1])
    np.testing.assert_allclose(np.asarray(inc["postnet_outputs"][:, :T]),
                               np.asarray(full["postnet_outputs"][:, :T]),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(inc["mel_lengths"]),
                               np.asarray(full["mel_lengths"]))
    # early exit: never runs past max_decoder_steps, stops on chunk boundary
    assert inc["postnet_outputs"].shape[1] <= full["postnet_outputs"].shape[1]


def test_inference_truncated_fresh_equals_inference(model, variables):
    """With no incoming stream state, inference_truncated must equal
    inference() exactly (same carry init, same scan)."""
    text, text_len, _, _, _ = make_batch(jax.random.PRNGKey(7))
    full = model.inference(variables, text, text_len, max_decoder_steps=10)
    out, stream = model.inference_truncated(variables, text, text_len,
                                            max_decoder_steps=10)
    np.testing.assert_allclose(np.asarray(out["postnet_outputs"]),
                               np.asarray(full["postnet_outputs"]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out["alignments"]),
                               np.asarray(full["alignments"]), atol=1e-6)
    assert len(stream) == 3  # (attn_hc, dec_hc, prev_frame)


def test_inference_truncated_streams_state_across_chunks(model, variables):
    """Chunk 2 decoded with chunk 1's stream state must (a) start from
    chunk 1's last frame and RNN hiddens — differing from a cold decode of
    the same text — and (b) return a usable next state (long-text streaming,
    reference inference_truncated)."""
    text1, len1, _, _, _ = make_batch(jax.random.PRNGKey(8))
    text2, len2, _, _, _ = make_batch(jax.random.PRNGKey(9))
    out1, stream1 = model.inference_truncated(variables, text1, len1,
                                              max_decoder_steps=8)
    # stream state reflects real decoding (nonzero hiddens / frame)
    assert any(float(jnp.abs(x).max()) > 0 for x in jax.tree_util.tree_leaves(stream1))
    warm, stream2 = model.inference_truncated(variables, text2, len2,
                                              max_decoder_steps=8,
                                              stream_state=stream1)
    cold, _ = model.inference_truncated(variables, text2, len2,
                                        max_decoder_steps=8)
    w = np.asarray(warm["postnet_outputs"])
    c = np.asarray(cold["postnet_outputs"])
    assert w.shape == c.shape and np.all(np.isfinite(w))
    assert not np.allclose(w, c)  # carried state changed the decode
    # determinism: same state, same chunk -> identical output
    again, _ = model.inference_truncated(variables, text2, len2,
                                         max_decoder_steps=8,
                                         stream_state=stream1)
    np.testing.assert_allclose(w, np.asarray(again["postnet_outputs"]), atol=0)


def test_bf16_inference_matches_f32(model, variables):
    """bf16 serving path (compute_dtype=jnp.bfloat16): outputs are f32,
    finite, and track the f32 decode within bf16 rounding tolerance — the
    quality gate for the MXU-native inference precision (VERDICT r1 #10)."""
    text, text_len, _, _, _ = make_batch(jax.random.PRNGKey(10))
    f32 = model.inference(variables, text, text_len, max_decoder_steps=12)
    b16 = model.inference(variables, text, text_len, max_decoder_steps=12,
                          compute_dtype=jnp.bfloat16)
    for k in ("postnet_outputs", "decoder_outputs", "alignments", "stop_probs"):
        a, b = np.asarray(f32[k]), np.asarray(b16[k])
        assert b.dtype == np.float32, k  # boundary casts back to f32
        assert np.all(np.isfinite(b)), k
        # bf16 has ~3 decimal digits; autoregressive feedback compounds it.
        # scale-relative gate, measured ~1e-2 on this model.
        scale = max(float(np.abs(a).max()), 1e-3)
        assert float(np.abs(a - b).max()) <= 0.08 * scale, (
            k, float(np.abs(a - b).max()), scale)
    # alignment rows remain normalized
    np.testing.assert_allclose(np.asarray(b16["alignments"]).sum(-1), 1.0,
                               atol=1e-2)


def test_bf16_inference_with_numpy_checkpoint_params(model, variables):
    """bf16 route with NUMPY param/state leaves, as load_checkpoint returns
    them (round-5 regression): numpy ml_dtypes-bf16 leaves used to hit
    NUMPY's promotion rules (bf16 + float -> f32) inside BatchNorm eval
    math, upcasting the graph and crashing the next conv with a mixed
    f32/bf16 dtype error. tree_cast_floats now returns jnp leaves."""
    np_vars = {
        "params": jax.tree_util.tree_map(np.asarray, variables["params"]),
        "state": jax.tree_util.tree_map(np.asarray, variables["state"]),
    }
    text, text_len, _, _, _ = make_batch(jax.random.PRNGKey(10))
    out = model.inference(np_vars, text, text_len, max_decoder_steps=8,
                          compute_dtype=jnp.bfloat16, use_pallas=False)
    assert np.all(np.isfinite(np.asarray(out["postnet_outputs"])))
    ref = model.inference(variables, text, text_len, max_decoder_steps=8,
                          compute_dtype=jnp.bfloat16, use_pallas=False)
    np.testing.assert_allclose(np.asarray(out["postnet_outputs"]),
                               np.asarray(ref["postnet_outputs"]), atol=1e-6)


def test_bf16_incremental_and_truncated_paths(model, variables):
    """The chunked serving path and the streaming path both run under bf16
    and produce finite f32 outputs with plausible stop behavior."""
    text, text_len, _, _, _ = make_batch(jax.random.PRNGKey(11))
    inc = model.inference_incremental(variables, text, text_len,
                                      chunk_steps=4, max_decoder_steps=12,
                                      compute_dtype=jnp.bfloat16)
    assert inc["postnet_outputs"].dtype == jnp.float32
    assert bool(jnp.isfinite(inc["postnet_outputs"]).all())
    out, stream = model.inference_truncated(variables, text, text_len,
                                            max_decoder_steps=8,
                                            compute_dtype=jnp.bfloat16)
    assert bool(jnp.isfinite(out["postnet_outputs"]).all())
    # a bf16 stream state seeds a follow-up f32 chunk (dtype bridging)
    out2, _ = model.inference_truncated(variables, text, text_len,
                                        max_decoder_steps=8,
                                        stream_state=stream)
    assert bool(jnp.isfinite(out2["postnet_outputs"]).all())


def test_factory_r_init_covers_gradual_schedule_tacotron1():
    """setup_model must size BOTH models' projections for the largest r in
    the gradual-training schedule (regression: the Tacotron1 branch dropped
    r_init, so set_r(schedule r) raised at training start)."""
    import dataclasses

    from your_voice_tts_tpu.config import AudioConfig, Config, TrainingConfig
    from your_voice_tts_tpu.models import setup_model

    for name in ("Tacotron2", "Tacotron"):
        cfg = Config(
            audio=AudioConfig(num_mels=N_MELS, fft_size=256, sample_rate=8000,
                              hop_length=64, win_length=256, mel_fmax=None),
            model=dataclasses.replace(SMALL, model=name),
            training=TrainingConfig(gradual_training=[[0, 7, 8],
                                                      [100, 5, 8]]))
        m = setup_model(30, 0, cfg)
        m.set_r(7)  # must not raise
        assert m.r_init >= 7


def test_inference_scan_freezes_stream_after_stop():
    """After a sample fires its stop token, the scan carry (the resumable
    stream state) must stay frozen at the stop point instead of evolving on
    zeroed inputs (regression: inference_truncated chunk 2 started from
    corrupted state)."""
    import dataclasses

    cfg = dataclasses.replace(SMALL, prenet_dropout=False, stop_threshold=0.0)
    model = Tacotron2(NUM_CHARS, cfg, n_mels=N_MELS)
    variables = model.init(jax.random.PRNGKey(0))
    p, state = variables["params"]["decoder"], variables["state"]["decoder"]
    enc = jax.random.normal(jax.random.PRNGKey(1), (2, 6, SMALL.encoder_dim))
    lens = jnp.array([6, 5])
    dec = model.decoder
    carry0 = dec.init_inference_carry(2, enc, None)
    # stop_threshold=0 -> every row is done after step 1
    carry1, _ = dec.inference_scan(p, state, enc, lens, carry0, 1, cfg.r)
    carryN, _ = dec.inference_scan(p, state, enc, lens, carry0, 6, cfg.r)
    for a, b in zip(jax.tree_util.tree_leaves(carry1[:2]),
                    jax.tree_util.tree_leaves(carryN[:2])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
