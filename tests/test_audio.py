"""DSP layer tests.

Three rings of evidence (SURVEY.md SS4 "Implication for the rebuild"):
1. The numpy oracle is validated against torch.stft (independent native FFT).
2. The JAX/TPU pipeline is held to <=1e-3 max-abs-diff against the oracle
   (the BASELINE.json mel-fidelity target).
3. Round-trip and behavioral tests mirror the reference's tests/test_audio.py.
"""

import numpy as np
import pytest

from oracle.audio_ref import AudioProcessorRef, mel_filterbank_slaney
from tests.fixtures import sine_sweep, speech_like, silence_padded, white_noise
from your_voice_tts_tpu.audio import AudioProcessor
from your_voice_tts_tpu.config import AudioConfig
from your_voice_tts_tpu.ops.filters import mel_basis

CFG = AudioConfig()


@pytest.fixture(scope="module")
def ap():
    return AudioProcessor(CFG)


@pytest.fixture(scope="module")
def ref():
    return AudioProcessorRef()


# --- ring 1: oracle vs torch -------------------------------------------------

def test_oracle_stft_matches_torch(ref):
    import torch

    y = speech_like()
    D_ref = ref._stft(y)
    D_torch = torch.stft(
        torch.from_numpy(y.astype(np.float64)),
        n_fft=CFG.fft_size, hop_length=CFG.hop_length, win_length=CFG.win_length,
        window=torch.hann_window(CFG.win_length, periodic=True, dtype=torch.float64),
        center=True, pad_mode="reflect", return_complex=True,
    ).numpy()
    assert D_ref.shape == D_torch.shape
    np.testing.assert_allclose(D_ref, D_torch, atol=1e-8)


def test_oracle_mel_filterbank_properties():
    fb = mel_filterbank_slaney(22050, 1024, 80, 0.0, 8000.0)
    assert fb.shape == (80, 513)
    assert np.all(fb >= 0)
    # every filter has support; peaks descend with Slaney area norm
    assert np.all(fb.max(axis=1) > 0)
    # package's independently-written filterbank agrees with the oracle's
    fb2 = mel_basis(22050, 1024, 80, 0.0, 8000.0)
    np.testing.assert_allclose(fb, fb2, atol=1e-10)


# --- ring 2: JAX pipeline vs oracle (the <=1e-3 parity gate) -------------------

@pytest.mark.parametrize("make", [sine_sweep, speech_like, white_noise])
def test_melspectrogram_parity(ap, ref, make):
    y = make()
    mel_tpu = ap.melspectrogram(y)
    mel_ref = ref.melspectrogram(y.astype(np.float64))
    assert mel_tpu.shape == mel_ref.shape
    diff = np.max(np.abs(mel_tpu - mel_ref))
    assert diff <= 1e-3, f"mel parity violated: max abs diff {diff}"


def test_spectrogram_parity(ap, ref):
    y = speech_like()
    s_tpu = ap.spectrogram(y)
    s_ref = ref.spectrogram(y.astype(np.float64))
    assert s_tpu.shape == s_ref.shape
    diff = np.abs(s_tpu - s_ref)
    # Strict 1e-3 away from the min_level clamp floor. Within ~1 dB of the
    # floor (|mag| ~ 1e-5), float32 FFT noise is amplified by the log and even
    # the float32 CPU reference would deviate this much from a float64 run.
    db_above_floor = (s_ref + CFG.max_norm) * (-CFG.min_level_db) / (2 * CFG.max_norm)
    near_floor = db_above_floor < 1.0
    assert np.max(diff[~near_floor]) <= 1e-3
    assert np.max(diff) <= 5e-3


def test_parity_on_awkward_length(ap, ref):
    # length deliberately not a multiple of hop or bucket
    y = speech_like()[: 22050 + 777]
    mel_tpu = ap.melspectrogram(y)
    mel_ref = ref.melspectrogram(y.astype(np.float64))
    assert mel_tpu.shape == mel_ref.shape
    assert np.max(np.abs(mel_tpu - mel_ref)) <= 1e-3


# --- ring 3: behavior --------------------------------------------------------

def test_normalize_denormalize_roundtrip(ref):
    import jax.numpy as jnp
    from your_voice_tts_tpu.ops import dsp

    S = np.random.default_rng(0).uniform(-100, 20, size=(40, 80)).astype(np.float32)
    n = dsp.normalize_spec(jnp.asarray(S), -100.0, 4.0, True, False)
    d = dsp.denormalize_spec(n, -100.0, 4.0, True, False)
    np.testing.assert_allclose(np.asarray(d), S, atol=1e-4)


def test_istft_stft_roundtrip():
    import jax.numpy as jnp
    from your_voice_tts_tpu.ops import dsp
    from your_voice_tts_tpu.ops.filters import hann_window

    y = speech_like(dur=0.7)
    n = len(y) - (len(y) % 256)
    y = y[:n]
    w = jnp.asarray(hann_window(1024, 1024), dtype=jnp.float32)
    D = dsp.stft(jnp.asarray(y), jnp.int32(n), 1024, 256, w)
    n_frames = n // 256 + 1
    rec = np.asarray(dsp.istft(D[:n_frames], 1024, 256, w))
    m = min(len(rec), n)
    # ignore edges (half window) where overlap-add is partial
    sl = slice(1024, m - 1024)
    np.testing.assert_allclose(rec[sl], y[sl], atol=1e-4)


def test_preemphasis_roundtrip():
    import jax.numpy as jnp
    from your_voice_tts_tpu.ops import dsp

    y = jnp.asarray(speech_like(dur=0.3))
    z = dsp.inv_preemphasis(dsp.preemphasis(y, 0.98), 0.98)
    np.testing.assert_allclose(np.asarray(z), np.asarray(y), atol=1e-4)


def test_inv_preemphasis_matches_oracle(ref):
    import jax.numpy as jnp
    from your_voice_tts_tpu.ops import dsp

    y = speech_like(dur=0.2)
    a = np.asarray(dsp.inv_preemphasis(jnp.asarray(y), 0.98))
    b = ref.apply_inv_preemphasis(y.astype(np.float64))
    np.testing.assert_allclose(a, b, atol=1e-3)


def test_griffin_lim_reconstruction(ap):
    """GL from a real mel should land near the original's mel (coarse SNR gate)."""
    y = sine_sweep(dur=1.0)
    mel = ap.melspectrogram(y)
    y_rec = ap.inv_melspectrogram(mel)
    assert len(y_rec) == ap.hop_length * (mel.shape[1] - 1)
    mel_rec = ap.melspectrogram(y_rec.astype(np.float32))
    t = min(mel.shape[1], mel_rec.shape[1]) - 4
    err = np.mean((mel[:, 2:t] - mel_rec[:, 2:t]) ** 2)
    sig = np.mean(mel[:, 2:t] ** 2)
    assert err < 0.25 * sig, f"GL reconstruction too lossy: err={err}, sig={sig}"


def test_trim_silence(ap):
    core = speech_like(dur=0.5)
    padded = silence_padded(core, lead=0.4, tail=0.5)
    trimmed = ap.trim_silence(padded)
    assert len(trimmed) < len(padded) - int(0.6 * ap.sample_rate)
    assert len(trimmed) >= int(0.4 * ap.sample_rate)


def test_trim_silence_matches_oracle(ap, ref):
    padded = silence_padded(speech_like(dur=0.5), lead=0.4, tail=0.5)
    a = ap.trim_silence(padded)
    b = ref.trim_silence(padded.astype(np.float64))
    assert len(a) == len(b)


def test_wav_io_roundtrip(ap, tmp_path):
    y = speech_like(dur=0.3)
    p = str(tmp_path / "x.wav")
    ap.save_wav(y, p)
    y2 = ap.load_wav(p)
    assert y2.dtype == np.float32
    assert abs(len(y2) - len(y)) == 0
    # save_wav peak-normalizes; compare shapes of normalized signals
    a = y / np.max(np.abs(y))
    b = y2 / np.max(np.abs(y2))
    assert np.corrcoef(a, b)[0, 1] > 0.999


def test_load_wav_resamples(ap, tmp_path):
    y = sine_sweep(sr=44100, dur=0.2)
    p = str(tmp_path / "hi.wav")
    ap.save_wav(y, p, sr=44100)
    y2 = ap.load_wav(p)  # resampled to 22050
    assert abs(len(y2) - len(y) // 2) <= 2


def test_find_endpoint(ap):
    wav = np.concatenate([
        speech_like(dur=0.5),
        np.zeros(int(1.2 * ap.sample_rate), dtype=np.float32),
    ])
    ep = ap.find_endpoint(wav)
    assert ep < len(wav)
    assert ep >= int(0.4 * ap.sample_rate)


def test_gl_fast_projector_matches_composition():
    """The banded frame-domain GL projector must equal stft(istft(.)) exactly
    on interior frames (edges use a different pad model, fine inside GL)."""
    import jax
    import jax.numpy as jnp
    from your_voice_tts_tpu.ops import dsp
    from your_voice_tts_tpu.ops.filters import hann_window

    n_fft, hop, T = 256, 64, 24
    w = jnp.asarray(hann_window(n_fft, n_fft), jnp.float32)
    F = (jax.random.normal(jax.random.PRNGKey(0), (T, n_fft // 2 + 1)) +
         1j * jax.random.normal(jax.random.PRNGKey(1), (T, n_fft // 2 + 1))
         ).astype(jnp.complex64)
    fast = dsp._gl_project_frames(F, w, n_fft, hop)
    y = dsp.istft(F, n_fft, hop, w)
    slow = dsp.stft(y, jnp.int32(hop * (T - 1)), n_fft, hop, w)[:T]
    K = n_fft // hop - 1
    np.testing.assert_allclose(np.asarray(fast[K:-K]), np.asarray(slow[K:-K]),
                               atol=1e-4)


def test_melspectrogram_batch_matches_single(ap):
    wavs = [speech_like(dur=d) for d in (0.3, 0.7, 1.1)]
    batch = ap.melspectrogram_batch(wavs)
    for y, m in zip(wavs, batch):
        single = ap.melspectrogram(y).T
        assert m.shape == single.shape
        np.testing.assert_allclose(m, single, atol=1e-5)


def test_stats_path_mean_std_normalization(tmp_path):
    """AudioConfig.stats_path switches normalization to per-bin mean/std
    scaling (reference scale_stats.npy): normalized corpus mels must be
    ~zero-mean/unit-std per bin, and inv_melspectrogram must invert through
    the same scaler."""
    import dataclasses

    from your_voice_tts_tpu.bin.compute_statistics import compute_statistics
    from your_voice_tts_tpu.config import AudioConfig
    from your_voice_tts_tpu.data.synthetic import make_synthetic_corpus
    from your_voice_tts_tpu.data.formatters import synthetic

    corpus = str(tmp_path / "corp")
    make_synthetic_corpus(corpus, n_items=4, sr=8000)
    base = AudioConfig(sample_rate=8000, fft_size=256, hop_length=64,
                       win_length=256, num_mels=20, mel_fmax=None,
                       do_trim_silence=False, griffin_lim_iters=4)
    items = synthetic(corpus)
    cfg_for_stats = dataclasses.replace(base)
    stats = compute_statistics(cfg_like(cfg_for_stats), items)
    sp = str(tmp_path / "scale_stats.npy")
    np.save(sp, stats, allow_pickle=True)

    ap = AudioProcessor(dataclasses.replace(base, stats_path=sp))
    mels = np.concatenate(
        [ap.melspectrogram(ap.load_wav(it[1])) for it in items], axis=1)
    assert abs(float(mels.mean())) < 0.1          # ~zero mean per corpus
    assert 0.8 < float(mels.std()) < 1.2          # ~unit variance
    # scaler round-trips through the inverse path (GL is lossy; check shape
    # + the denormalized dB range is plausible rather than clipped)
    wav = ap.inv_melspectrogram(mels[:, :32])
    assert wav.ndim == 1 and len(wav) > 0 and np.all(np.isfinite(wav))


def cfg_like(audio_cfg):
    """Wrap a bare AudioConfig in the minimal object compute_statistics needs."""
    import types

    return types.SimpleNamespace(audio=audio_cfg)


def test_fgla_momentum_beats_plain_reference_iters(ap):
    """The config default (FGLA momentum 0.95, 30 iters) must reach at least
    the spectral convergence of the reference's plain 60-iteration GL —
    the evidence for shipping half the iterations as the default."""
    import jax
    import jax.numpy as jnp

    from your_voice_tts_tpu.ops import dsp
    from your_voice_tts_tpu.ops.filters import hann_window

    y = sine_sweep(dur=1.0)
    n_fft, hop = ap.cfg.fft_size, ap.cfg.hop_length
    w = jnp.asarray(hann_window(ap.cfg.win_length, n_fft), jnp.float32)
    L = jnp.int32(len(y))
    S = jnp.abs(dsp.stft(jnp.asarray(y), L, n_fft, hop, w))[:-4]

    def sc(n_iters, momentum):
        yr = dsp.griffin_lim(S, jax.random.PRNGKey(0), n_iters=n_iters,
                             n_fft=n_fft, hop=hop, window=w,
                             momentum=momentum)
        L2 = jnp.int32(yr.shape[0])
        S2 = jnp.abs(dsp.stft(yr, L2, n_fft, hop, w))[: S.shape[0]]
        return float(jnp.linalg.norm(S2 - S) / jnp.linalg.norm(S))

    fgla = sc(30, 0.95)
    plain = sc(60, 0.0)
    assert fgla <= plain * 1.05, (fgla, plain)


def test_inv_melspectrogram_batch_matches_single(ap):
    """Length-bucketed batched Griffin-Lim == the single-row inverse: with
    the same launch key, the batch-invariant phase init draws exactly the
    per-row path's phase pattern, so a batched row reproduces the single
    call (serving's GL stage runs through this)."""
    import jax

    mels = [ap.melspectrogram(speech_like(dur=d)) for d in (0.30, 0.55, 1.1)]
    ap._gl_key = jax.random.PRNGKey(42)
    batched = ap.inv_melspectrogram_batch(list(mels))
    for w, m in zip(batched, mels):
        assert len(w) == ap.hop_length * (m.shape[1] - 1)
    # row 0's launch consumed the first subkey of _gl_key, same as a fresh
    # single-row call from the same key state
    ap._gl_key = jax.random.PRNGKey(42)
    ref0 = ap.inv_melspectrogram(mels[0])
    np.testing.assert_allclose(batched[0], ref0, atol=2e-4)


def test_inv_batch_rows_independent_of_batchmates(ap):
    """A row's audio is a pure function of (its mel, key): alone vs packed
    with batchmates gives identical bytes (batch-invariant GL + normalized
    silence padding)."""
    import jax

    mel_a = ap.melspectrogram(speech_like(dur=0.5))
    mel_b = ap.melspectrogram(sine_sweep(dur=0.45))
    mel_c = ap.melspectrogram(white_noise(dur=0.4))
    ap._gl_key = jax.random.PRNGKey(7)
    alone = ap.inv_melspectrogram_batch([mel_a])[0]
    ap._gl_key = jax.random.PRNGKey(7)
    packed = ap.inv_melspectrogram_batch([mel_a, mel_b, mel_c])[0]
    np.testing.assert_allclose(alone, packed, atol=1e-5)


def test_inv_batch_reconstruction_quality(ap):
    """Batched inverse reconstructs as well as the per-row path."""
    y = sine_sweep(dur=1.0)
    mel = ap.melspectrogram(y)
    y_rec = ap.inv_melspectrogram_batch([mel])[0]
    mel_rec = ap.melspectrogram(y_rec.astype(np.float32))
    t = min(mel.shape[1], mel_rec.shape[1]) - 4
    err = np.mean((mel[:, 2:t] - mel_rec[:, 2:t]) ** 2)
    sig = np.mean(mel[:, 2:t] ** 2)
    assert err < 0.25 * sig, f"batched GL too lossy: err={err}, sig={sig}"
