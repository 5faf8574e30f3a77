"""Native (C++) data-loader: WAV codec + resampler parity and robustness.

The native module is the framework's equivalent of the reference's
libsndfile/librosa host-side IO (reference datasets/TTSDataset.py loads via
librosa; scipy.io.wavfile writes).  Gates here:
  - decode parity vs the stdlib `wave` module on PCM16,
  - decode of formats the stdlib CANNOT read (24-bit PCM, IEEE float),
  - resampler parity vs scipy.signal.resample_poly (same filter design),
  - batch decode (threaded path) equivalence + per-row failure isolation,
  - AudioProcessor.load_wav integration.
"""

import os
import struct
import wave

import numpy as np
import pytest

from your_voice_tts_tpu import native
from your_voice_tts_tpu.audio import AudioProcessor
from your_voice_tts_tpu.config import AudioConfig

pytestmark = pytest.mark.skipif(
    not native.available(), reason=f"native loader: {native.build_error()}")

RNG = np.random.default_rng(7)


def _write_pcm16(path, x, sr=22050, channels=1):
    with wave.open(str(path), "wb") as f:
        f.setnchannels(channels)
        f.setsampwidth(2)
        f.setframerate(sr)
        f.writeframes((np.clip(x, -1, 1) * 32767).astype(np.int16).tobytes())


def _write_raw(path, data: bytes, sr, channels, bits, fmt):
    block = channels * bits // 8
    hdr = (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVEfmt "
           + struct.pack("<IHHIIHH", 16, fmt, channels, sr, sr * block,
                         block, bits)
           + b"data" + struct.pack("<I", len(data)))
    with open(path, "wb") as f:
        f.write(hdr + data)


def test_pcm16_parity_with_stdlib(tmp_path):
    x = (RNG.standard_normal(4096) * 0.3).astype(np.float32)
    p = tmp_path / "a.wav"
    _write_pcm16(p, x)
    y, sr = native.decode(str(p))
    ref = np.frombuffer(open(p, "rb").read()[44:], np.int16).astype(
        np.float32) / 32768.0
    assert sr == 22050
    np.testing.assert_array_equal(y, ref)


def test_pcm24_and_float32_decode(tmp_path):
    # the stdlib `wave`-based fallback cannot represent either format
    x = (RNG.standard_normal(2048) * 0.5).astype(np.float32)
    i24 = (np.clip(x, -1, 1) * 8388607).astype(np.int32)
    raw = b"".join(int(v & 0xFFFFFF).to_bytes(3, "little") for v in i24)
    p24 = tmp_path / "a24.wav"
    _write_raw(p24, raw, 16000, 1, 24, fmt=1)
    y24, sr = native.decode(str(p24))
    assert sr == 16000
    np.testing.assert_allclose(y24, i24 / 8388608.0, atol=1e-7)

    pf = tmp_path / "af.wav"
    _write_raw(pf, x.tobytes(), 48000, 1, 32, fmt=3)
    yf, sr = native.decode(str(pf))
    assert sr == 48000
    np.testing.assert_array_equal(yf, x)


def test_stereo_downmix_mean(tmp_path):
    x = (RNG.standard_normal(1024) * 0.4).astype(np.float32)
    st = np.stack([x, -0.5 * x], axis=1).reshape(-1)
    p = tmp_path / "s.wav"
    _write_pcm16(p, st, channels=2)
    y, _ = native.decode(str(p))
    q = (np.clip(x, -1, 1) * 32767).astype(np.int16) / 32768.0
    q2 = (np.clip(-0.5 * x, -1, 1) * 32767).astype(np.int16) / 32768.0
    np.testing.assert_allclose(y, (q + q2) / 2, atol=1e-6)


@pytest.mark.parametrize("up,down", [(147, 320), (320, 147), (2, 1), (160, 441)])
def test_resample_matches_scipy(up, down):
    from scipy.signal import resample_poly

    x = (RNG.standard_normal(22050) * 0.3).astype(np.float32)
    r_native = native.resample_poly(x, up, down)
    r_scipy = resample_poly(x.astype(np.float64), up, down)
    assert r_native.size == r_scipy.size
    np.testing.assert_allclose(r_native, r_scipy, atol=2e-6)


def test_error_paths(tmp_path):
    bad = tmp_path / "bad.wav"
    bad.write_bytes(b"NOTAWAVE")
    with pytest.raises(native.NativeWavError):
        native.decode(str(bad))
    with pytest.raises(native.NativeWavError):
        native.wav_info(str(tmp_path / "missing.wav"))
    # truncated data chunk: header promises more frames than exist
    x = (RNG.standard_normal(512) * 0.3).astype(np.float32)
    trunc = tmp_path / "t.wav"
    _write_pcm16(trunc, x)
    data = trunc.read_bytes()
    trunc.write_bytes(data[: len(data) - 400])
    with pytest.raises(native.NativeWavError):
        native.decode(str(trunc))


def test_batch_decode_matches_single(tmp_path):
    paths = []
    refs = []
    for i in range(5):
        x = (RNG.standard_normal(3000 + 500 * i) * 0.3).astype(np.float32)
        p = tmp_path / f"b{i}.wav"
        _write_pcm16(p, x, sr=22050)
        paths.append(str(p))
        refs.append(native.decode(str(p))[0])
    bad = tmp_path / "bad.wav"
    bad.write_bytes(b"junk")
    paths.append(str(bad))
    waves, rates = native.decode_batch(paths, target_sr=16000, n_threads=4)
    assert waves[-1] is None and rates[-1] == 0
    for w, ref, r in zip(waves[:-1], refs, rates[:-1]):
        assert r == 22050
        expect = native.resample_poly(ref, 320, 441)
        np.testing.assert_allclose(w, expect, atol=1e-6)


def test_audio_processor_native_path(tmp_path):
    """load_wav + load_wav_batch route through the native decoder, including
    a 24-bit file the Python fallback would reject."""
    ap = AudioProcessor(AudioConfig(sample_rate=16000, do_trim_silence=False))
    x = (RNG.standard_normal(22050) * 0.3).astype(np.float32)
    p16 = tmp_path / "p.wav"
    _write_pcm16(p16, x, sr=22050)
    y = ap.load_wav(str(p16))
    assert y.dtype == np.float32 and abs(y.size - 16000) <= 2

    i24 = (np.clip(x, -1, 1) * 8388607).astype(np.int32)
    raw = b"".join(int(v & 0xFFFFFF).to_bytes(3, "little") for v in i24)
    p24 = tmp_path / "p24.wav"
    _write_raw(p24, raw, 16000, 1, 24, fmt=1)
    y24 = ap.load_wav(str(p24))
    np.testing.assert_allclose(y24, i24 / 8388608.0, atol=1e-6)

    batch = ap.load_wav_batch([str(p16), str(p24)])
    np.testing.assert_allclose(batch[0], y, atol=1e-6)
    np.testing.assert_allclose(batch[1], y24, atol=1e-6)


def test_encode16_roundtrip(tmp_path):
    x = np.sin(np.linspace(0, 50, 8000)).astype(np.float32) * 0.8
    p = tmp_path / "e.wav"
    native.encode16(str(p), x, 22050)
    y, sr = native.decode(str(p))
    assert sr == 22050
    # encode scales by 32767, decode divides by 32768: bound is
    # (0.5 + max|x|) / 32768
    np.testing.assert_allclose(y, x, atol=1.5 / 32768)


def test_wav_info(tmp_path):
    x = (RNG.standard_normal(1234) * 0.3).astype(np.float32)
    p = tmp_path / "i.wav"
    _write_pcm16(p, x, sr=8000)
    info = native.wav_info(str(p))
    assert info == {"sample_rate": 8000, "channels": 1, "bits": 16,
                    "fmt": 1, "n_frames": 1234}
