"""Pallas kernel correctness (interpret mode on CPU; real-TPU timing lives in
bench scripts)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from your_voice_tts_tpu.ops.pallas.wavernn_gen import wavernn_generate_pallas
from your_voice_tts_tpu.vocoder.models.wavernn import WaveRNN

KEY = jax.random.PRNGKey(0)


@pytest.fixture(scope="module")
def small_wavernn():
    model = WaveRNN(n_mels=20, bits=8, rnn_dims=32, fc_dims=32, compute_dims=16,
                    res_out_dims=16, num_res_blocks=2, pad=2,
                    upsample_factors=(4, 4, 4))
    return model, model.init(KEY)


def test_wavernn_pallas_matches_scan_greedy(small_wavernn):
    """Weights-resident kernel must reproduce the XLA scan exactly when
    sampling is removed (greedy argmax)."""
    model, p = small_wavernn
    mel = jax.random.normal(jax.random.PRNGKey(1), (12, 20))
    cond, aux = model.upsample(p["upsample"], mel[None])
    cond = jnp.tile(cond, (2, 1, 1))
    aux = jnp.tile(aux, (2, 1, 1))
    with pltpu.force_tpu_interpret_mode():
        out = wavernn_generate_pallas(p, cond, aux, seed=0, bits=8, chunk=64,
                                      greedy=True)
    ref = model.generate_fold(p, cond, aux, jax.random.PRNGKey(2), greedy=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_wavernn_pallas_sampling_stats(small_wavernn):
    """Sampled output must land in mu-law range with plausible variance."""
    model, p = small_wavernn
    mel = jax.random.normal(jax.random.PRNGKey(1), (12, 20))
    cond, aux = model.upsample(p["upsample"], mel[None])
    with pltpu.force_tpu_interpret_mode():
        out = wavernn_generate_pallas(p, cond, aux, seed=7, bits=8, chunk=64)
    a = np.asarray(out)
    assert a.shape == (1, cond.shape[1])
    assert np.all(np.abs(a) <= 1.0)
    assert a.std() > 0.01  # not collapsed


def test_wavernn_pallas_chunk_invariance(small_wavernn):
    """Chunking is an implementation detail: greedy output must not depend
    on the chunk size."""
    model, p = small_wavernn
    mel = jax.random.normal(jax.random.PRNGKey(3), (12, 20))
    cond, aux = model.upsample(p["upsample"], mel[None])
    with pltpu.force_tpu_interpret_mode():
        o1 = wavernn_generate_pallas(p, cond, aux, seed=0, bits=8, chunk=64,
                                     greedy=True)
        o2 = wavernn_generate_pallas(p, cond, aux, seed=0, bits=8, chunk=128,
                                     greedy=True)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-5)


def test_gl_fused_iteration_matches_xla_projection():
    """The fused GL-iteration kernel must match the XLA fast projector +
    phase projection (f32) elementwise."""
    from your_voice_tts_tpu.ops import dsp
    from your_voice_tts_tpu.ops.filters import hann_window
    from your_voice_tts_tpu.ops.pallas.griffin_lim import (
        gl_iteration_pallas, ola_wsum_inv,
    )

    n_fft, hop, T = 256, 64, 32
    w = hann_window(n_fft, n_fft).astype(np.float32)
    wj = jnp.asarray(w)
    wsi = jnp.asarray(ola_wsum_inv(w, n_fft, hop))
    mag = jnp.abs(jax.random.normal(KEY, (T, n_fft // 2 + 1))) + 0.1
    ph = jax.random.uniform(jax.random.PRNGKey(1), mag.shape) * 2 * np.pi
    Fr, Fi = mag * jnp.cos(ph), mag * jnp.sin(ph)
    Gr, Gi = dsp._gl_project_frames_matmul(Fr, Fi, wj, n_fft, hop,
                                           dtype=jnp.float32)
    inv = 1.0 / jnp.maximum(jnp.sqrt(Gr ** 2 + Gi ** 2), 1e-15)
    with pltpu.force_tpu_interpret_mode():
        out_r, out_i = gl_iteration_pallas(Fr, Fi, mag, wj, wsi, n_fft, hop,
                                           tile=T, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out_r), np.asarray(mag * Gr * inv),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(out_i), np.asarray(mag * Gi * inv),
                               atol=1e-4)


def test_gl_batch_xla_path_reconstruction():
    """griffin_lim_batch (XLA path) reconstructs like the per-item GL."""
    from your_voice_tts_tpu.ops import dsp
    from your_voice_tts_tpu.ops.filters import hann_window

    n_fft, hop, T = 256, 64, 24
    w = jnp.asarray(hann_window(n_fft, n_fft), jnp.float32)
    mag = jnp.abs(jax.random.normal(KEY, (2, T, n_fft // 2 + 1)))
    y = dsp.griffin_lim_batch(mag, KEY, n_iters=4, n_fft=n_fft, hop=hop,
                              window=w, use_pallas=False)
    assert y.shape == (2, hop * (T - 1))
    assert np.all(np.isfinite(np.asarray(y)))
