"""Tacotron(1) model tests (reference tests/test_tacotron_model.py pattern):
shapes, CBHG behavior, train-step params-change, linear-spec loss, inference,
end-to-end synthesis through the Tacotron1 + inv_spectrogram path."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from your_voice_tts_tpu.config import AudioConfig, Config, ModelConfig
from your_voice_tts_tpu.models.losses import TacotronLoss
from your_voice_tts_tpu.models.tacotron import CBHG, Tacotron

KEY = jax.random.PRNGKey(0)
N_MELS, N_FREQ = 20, 129
SMALL = ModelConfig(model="Tacotron", r=5, memory_size=4, max_decoder_steps=8,
                    attention_dim=24, attention_location_filters=8,
                    attention_location_kernel_size=15, tacotron_width=32)


@pytest.fixture(scope="module")
def model():
    return Tacotron(30, SMALL, n_mels=N_MELS, num_freq=N_FREQ)


@pytest.fixture(scope="module")
def variables(model):
    return model.init(KEY)


def make_batch(key, B=2, T_text=10, T_mel=20):
    k1, k2, k3 = jax.random.split(key, 3)
    return (jax.random.randint(k1, (B, T_text), 1, 30),
            jnp.array([T_text, T_text - 3]),
            jax.random.normal(k2, (B, T_mel, N_MELS)),
            jax.random.normal(k3, (B, T_mel, N_FREQ)),
            jnp.array([T_mel, T_mel - 5]))


def test_cbhg_shapes():
    cbhg = CBHG(32, K=4, bank_channels=16, projections=(16, 32),
                highway_dim=16, gru_dim=16)
    p = cbhg.init(KEY)
    s = cbhg.init_state()
    x = jax.random.normal(KEY, (2, 12, 32))
    y, _ = cbhg(p, s, x, train=True)
    assert y.shape == (2, 12, 32)


def test_forward_shapes(model, variables):
    text, tlen, mels, linear, mlen = make_batch(jax.random.PRNGKey(1))
    out = model.forward(variables, text, tlen, mels, rng=jax.random.PRNGKey(2))
    assert out["decoder_outputs"].shape == mels.shape
    assert out["postnet_outputs"].shape == (2, 20, N_FREQ)
    assert out["alignments"].shape == (2, 20 // SMALL.r, 10)
    a = np.asarray(out["alignments"])
    np.testing.assert_allclose(a.sum(-1), 1.0, atol=1e-4)


def test_train_step_linear_loss_and_params_change(model, variables):
    criterion = TacotronLoss("Tacotron", ga_alpha=5.0)
    optimizer = optax.adam(1e-3)
    text, tlen, mels, linear, mlen = make_batch(jax.random.PRNGKey(3))
    stop_t = jnp.zeros((2, 20 // SMALL.r))

    def loss_fn(params, state):
        out = model.forward({"params": params, "state": state}, text, tlen,
                            mels, rng=jax.random.PRNGKey(5))
        total, parts = criterion(out, mels, mlen, stop_t, tlen, r=SMALL.r,
                                 linear_target=linear, n_priority_freq=40)
        return total, parts

    params, state = variables["params"], variables["state"]
    opt_state = optimizer.init(params)

    @jax.jit
    def step(params, state, opt_state):
        (loss, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, state)
        updates, opt_state = optimizer.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(4):
        params, opt_state, loss = step(params, state, opt_state)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    flat0 = {jax.tree_util.keystr(k): v for k, v in
             jax.tree_util.tree_leaves_with_path(variables["params"])}
    unchanged = [k for k, v in
                 ((jax.tree_util.keystr(kk), vv) for kk, vv in
                  jax.tree_util.tree_leaves_with_path(params))
                 if np.allclose(np.asarray(v), np.asarray(flat0[k]))]
    assert not unchanged, f"params never updated: {unchanged}"


def test_inference_and_memory_queue(model, variables):
    text, tlen, _, _, _ = make_batch(jax.random.PRNGKey(6))
    out = model.inference(variables, text, tlen, rng=jax.random.PRNGKey(7))
    assert out["postnet_outputs"].shape == (2, SMALL.max_decoder_steps * SMALL.r,
                                            N_FREQ)
    assert out["mel_lengths"].shape == (2,)


def test_factory_and_synthesis_linear_path(tmp_path):
    from your_voice_tts_tpu.audio import AudioProcessor
    from your_voice_tts_tpu.infer.synthesis import synthesis
    from your_voice_tts_tpu.models import setup_model
    from your_voice_tts_tpu.text import symbols

    audio = AudioConfig(sample_rate=8000, fft_size=256, hop_length=64,
                        win_length=256, num_mels=N_MELS, mel_fmax=None,
                        do_trim_silence=False, griffin_lim_iters=5)
    cfg = Config(audio=audio, model=SMALL)
    model = setup_model(len(symbols), 0, cfg)
    assert model.output_type == "linear"
    assert model.num_freq == audio.num_freq
    variables = model.init(KEY)
    ap = AudioProcessor(audio)
    res = synthesis(model, variables, "hello", cfg, ap)
    assert res["mel_postnet_spec"].shape[0] == audio.num_freq
    assert len(res["wav"]) > 0


@pytest.mark.slow  # ~15 s; the Tacotron2 bf16 parity test stays in-suite
def test_bf16_inference_matches_f32(model, variables):
    """Tacotron(1) under the bf16 serving path: f32 outputs, finite, within
    bf16 rounding of the f32 decode (shared gate with Tacotron2)."""
    text, text_len, _, _, _ = make_batch(jax.random.PRNGKey(12))
    f32 = model.inference(variables, text, text_len)
    b16 = model.inference(variables, text, text_len,
                          compute_dtype=jnp.bfloat16)
    for k in ("postnet_outputs", "decoder_outputs"):
        a, b = np.asarray(f32[k]), np.asarray(b16[k])
        assert b.dtype == np.float32 and np.all(np.isfinite(b)), k
        scale = max(float(np.abs(a).max()), 1e-3)
        assert float(np.abs(a - b).max()) <= 0.08 * scale, (
            k, float(np.abs(a - b).max()), scale)
