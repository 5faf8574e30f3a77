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


def test_gl_full_kernel_matches_iteration_kernel():
    """The whole-loop kernel (default TPU serving path for T<=1024) must equal
    n_iters applications of the per-iteration kernel from the same injected
    initial phase (f32; the transposed-contraction forward DFT and the C/S
    matrices agree to f32 rounding)."""
    from your_voice_tts_tpu.ops.filters import hann_window
    from your_voice_tts_tpu.ops.pallas.griffin_lim import (
        gl_iteration_pallas, griffin_lim_pallas_full, ola_wsum_inv,
    )

    n_fft, hop, B, T, n_iters = 256, 64, 2, 24, 3
    Kf = n_fft // 2 + 1
    w = hann_window(n_fft, n_fft).astype(np.float32)
    wj = jnp.asarray(w)
    wsi = jnp.asarray(ola_wsum_inv(w, n_fft, hop))
    mag = jnp.abs(jax.random.normal(KEY, (B, T, Kf))) + 0.1
    ph = jax.random.uniform(jax.random.PRNGKey(5), (B, T, Kf)) * 2 * np.pi

    with pltpu.force_tpu_interpret_mode():
        F = griffin_lim_pallas_full(mag, 0, n_iters=n_iters, n_fft=n_fft,
                                    hop=hop, window=wj, dtype=jnp.float32,
                                    init_phase=ph)
        # reference: per-iteration kernel, same padded/flattened layout
        Tp = ((T + 7) // 8) * 8
        mag_p = jnp.pad(mag, ((0, 0), (0, Tp - T), (0, 0))).reshape(B * Tp, Kf)
        ph_p = jnp.pad(ph, ((0, 0), (0, Tp - T), (0, 0))).reshape(B * Tp, Kf)
        Fr = mag_p * jnp.cos(ph_p)
        Fi = mag_p * jnp.sin(ph_p)
        for _ in range(n_iters):
            Fr, Fi = gl_iteration_pallas(Fr, Fi, mag_p, wj, wsi, n_fft, hop,
                                         tile=Tp, dtype=jnp.float32)
    ref = np.asarray(jax.lax.complex(Fr, Fi).reshape(B, Tp, Kf)[:, :T])
    got = np.asarray(F)
    np.testing.assert_allclose(got.real, ref.real, atol=3e-3)
    np.testing.assert_allclose(got.imag, ref.imag, atol=3e-3)


def test_gl_full_kernel_reconstruction_gate():
    """Quality gate for the default TPU serving path: |STFT(GL(S))| must
    approach S (err/sig <= 0.25) through the use_pallas=True route with the
    production bf16 loop state and in-kernel PRNG phase init."""
    from your_voice_tts_tpu.ops import dsp
    from your_voice_tts_tpu.ops.filters import hann_window

    n_fft, hop, T, B = 256, 64, 40, 2
    sr_len = hop * (T + 3)
    t = np.arange(sr_len) / 8000.0
    wav = np.stack([
        0.6 * np.sin(2 * np.pi * 440.0 * t) + 0.2 * np.sin(2 * np.pi * 1313.0 * t),
        0.5 * np.sin(2 * np.pi * 220.0 * t) * np.linspace(0.2, 1.0, sr_len),
    ]).astype(np.float32)
    w = jnp.asarray(hann_window(n_fft, n_fft), jnp.float32)
    S = jnp.abs(jax.vmap(
        lambda y: dsp.stft(y, jnp.int32(sr_len), n_fft, hop, w))(
            jnp.asarray(wav)))[:, :T]
    with pltpu.force_tpu_interpret_mode():
        y = dsp.griffin_lim_batch(S, KEY, n_iters=30, n_fft=n_fft, hop=hop,
                                  window=w, use_pallas=True)
    assert y.shape == (B, hop * (T - 1))
    S2 = jnp.abs(jax.vmap(
        lambda v: dsp.stft(v, jnp.int32(y.shape[1]), n_fft, hop, w))(y))[:, :T]
    err = float(jnp.linalg.norm(S2 - S) / jnp.linalg.norm(S))
    assert err <= 0.25, f"GL reconstruction err/sig {err:.3f} > 0.25"


def test_gl_batch_routing_by_length(monkeypatch):
    """T<=1024 must route to the whole-loop kernel, T>1024 to the
    per-iteration kernel (VMEM residency bound, validated on v5e at
    1024-frame tiles) — guard the dispatch in griffin_lim_batch."""
    from your_voice_tts_tpu.ops import dsp
    from your_voice_tts_tpu.ops.filters import hann_window
    from your_voice_tts_tpu.ops.pallas import griffin_lim as glmod

    calls = []

    def fake_full(S_mag, seed, **kw):
        calls.append("full")
        return S_mag.astype(jnp.complex64)

    def fake_batch(S_mag, key, **kw):
        calls.append("iter")
        return jnp.ones(S_mag.shape, jnp.complex64)

    monkeypatch.setattr(glmod, "griffin_lim_pallas_full", fake_full)
    monkeypatch.setattr(glmod, "griffin_lim_pallas_batch", fake_batch)
    n_fft, hop = 256, 64
    w = jnp.asarray(hann_window(n_fft, n_fft), jnp.float32)
    short = jnp.ones((2, 32, n_fft // 2 + 1))
    long = jnp.ones((2, 1030, n_fft // 2 + 1))
    dsp.griffin_lim_batch(short, KEY, n_iters=1, n_fft=n_fft, hop=hop,
                          window=w, use_pallas=True)
    dsp.griffin_lim_batch(long, KEY, n_iters=1, n_fft=n_fft, hop=hop,
                          window=w, use_pallas=True)
    assert calls == ["full", "iter"]


@pytest.mark.parametrize("mode,nmix", [("mol", 4), ("gauss", 0)])
def test_wavernn_pallas_mode_matches_scan_greedy(mode, nmix):
    """MoL/Gaussian in-kernel sampling must reproduce the XLA scan exactly
    under greedy (argmax-mixture-mean / mean) decoding."""
    model = WaveRNN(n_mels=20, bits=8, rnn_dims=32, fc_dims=32, compute_dims=16,
                    res_out_dims=16, num_res_blocks=2, pad=2,
                    upsample_factors=(4, 4, 4), mode=mode,
                    num_mixtures=max(nmix, 1))
    p = model.init(KEY)
    mel = jax.random.normal(jax.random.PRNGKey(1), (12, 20))
    cond, aux = model.upsample(p["upsample"], mel[None])
    cond = jnp.tile(cond, (2, 1, 1))
    aux = jnp.tile(aux, (2, 1, 1))
    with pltpu.force_tpu_interpret_mode():
        out = wavernn_generate_pallas(p, cond, aux, seed=0, bits=8, chunk=64,
                                      mode=mode, num_mixtures=max(nmix, 1),
                                      greedy=True)
    ref = model.generate_fold(p, cond, aux, jax.random.PRNGKey(2), greedy=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


@pytest.mark.parametrize("mode", ["mol", "gauss"])
def test_wavernn_pallas_mode_sampling_stats(mode):
    """Sampled MoL/Gaussian output must be bounded and non-degenerate."""
    model = WaveRNN(n_mels=20, bits=8, rnn_dims=32, fc_dims=32, compute_dims=16,
                    res_out_dims=16, num_res_blocks=2, pad=2,
                    upsample_factors=(4, 4, 4), mode=mode, num_mixtures=4)
    p = model.init(KEY)
    mel = jax.random.normal(jax.random.PRNGKey(1), (12, 20))
    cond, aux = model.upsample(p["upsample"], mel[None])
    with pltpu.force_tpu_interpret_mode():
        out = wavernn_generate_pallas(p, cond, aux, seed=7, bits=8, chunk=64,
                                      mode=mode, num_mixtures=4)
    a = np.asarray(out)
    assert a.shape == (1, cond.shape[1])
    assert np.all(np.abs(a) <= 1.0) and np.all(np.isfinite(a))
    assert a.std() > 1e-3  # not collapsed


def test_wavernn_pallas_sampled_chunk_invariance(small_wavernn):
    """The hash PRNG is keyed on the GLOBAL sample index, so even SAMPLED
    output must be bit-identical across chunk sizes."""
    model, p = small_wavernn
    mel = jax.random.normal(jax.random.PRNGKey(3), (12, 20))
    cond, aux = model.upsample(p["upsample"], mel[None])
    with pltpu.force_tpu_interpret_mode():
        o1 = wavernn_generate_pallas(p, cond, aux, seed=11, bits=8, chunk=64)
        o2 = wavernn_generate_pallas(p, cond, aux, seed=11, bits=8, chunk=128)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
