"""Numpy oracle for the reference AudioProcessor (librosa semantics).

Reimplements, in plain numpy, the exact DSP conventions the reference inherits
from librosa + mozilla/TTS `utils/audio.py` (SURVEY.md SS2.1 "AudioProcessor"):

- STFT: center=True with reflect padding of n_fft//2; periodic Hann of
  win_length zero-padded (centered) to n_fft; column t = rfft of frame t.
- Mel filterbank: Slaney scale (linear < 1kHz, log above), Slaney area
  normalization (librosa.filters.mel(htk=False, norm='slaney')).
- amp->dB: spec_gain * log10(max(min_level, x)), min_level = 10^(min_level_db/20).
- normalize: ((S - min_level_db) / -min_level_db) scaled to [0, max_norm] or
  symmetric [-max_norm, max_norm], optional clipping.
- Griffin-Lim: random phase init, iters of istft->stft phase projection,
  magnitudes raised to `power` first.
- preemphasis y[n] = x[n] - a x[n-1]; inverse is the IIR filter 1/(1 - a z^-1).
"""

from __future__ import annotations

import numpy as np


def hann_periodic(win_length: int) -> np.ndarray:
    """Periodic (DFT-even) Hann window, == scipy.signal.get_window('hann', n)."""
    n = np.arange(win_length)
    return 0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)


def hz_to_mel_slaney(f):
    f = np.asanyarray(f, dtype=np.float64)
    f_sp = 200.0 / 3
    mels = f / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    log_region = f >= min_log_hz
    mels = np.where(log_region, min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep, mels)
    return mels


def mel_to_hz_slaney(m):
    m = np.asanyarray(m, dtype=np.float64)
    f_sp = 200.0 / 3
    freqs = m * f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    log_region = m >= min_log_mel
    freqs = np.where(log_region, min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs)
    return freqs


def mel_filterbank_slaney(sample_rate: int, n_fft: int, n_mels: int,
                          fmin: float = 0.0, fmax: float | None = None) -> np.ndarray:
    """librosa.filters.mel(sr, n_fft, n_mels, fmin, fmax, htk=False, norm='slaney')."""
    if fmax is None:
        fmax = sample_rate / 2.0
    fft_freqs = np.linspace(0.0, sample_rate / 2.0, n_fft // 2 + 1)
    mel_pts = np.linspace(hz_to_mel_slaney(fmin), hz_to_mel_slaney(fmax), n_mels + 2)
    hz_pts = mel_to_hz_slaney(mel_pts)
    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    enorm = 2.0 / (hz_pts[2: n_mels + 2] - hz_pts[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float64)


class AudioProcessorRef:
    """Reference-parity numpy AudioProcessor (reference: utils/audio.py)."""

    def __init__(
        self,
        sample_rate: int = 22050,
        num_mels: int = 80,
        fft_size: int = 1024,
        hop_length: int = 256,
        win_length: int = 1024,
        preemphasis: float = 0.98,
        ref_level_db: float = 20.0,
        min_level_db: float = -100.0,
        power: float = 1.5,
        griffin_lim_iters: int = 60,
        signal_norm: bool = True,
        symmetric_norm: bool = True,
        max_norm: float = 4.0,
        clip_norm: bool = True,
        mel_fmin: float = 0.0,
        mel_fmax: float | None = 8000.0,
        spec_gain: float = 20.0,
        do_trim_silence: bool = False,
        trim_db: float = 60.0,
        do_sound_norm: bool = False,
        **_unused,
    ):
        self.sample_rate = sample_rate
        self.num_mels = num_mels
        self.fft_size = fft_size
        self.hop_length = hop_length
        self.win_length = win_length
        self.preemphasis = preemphasis
        self.ref_level_db = ref_level_db
        self.min_level_db = min_level_db
        self.power = power
        self.griffin_lim_iters = griffin_lim_iters
        self.signal_norm = signal_norm
        self.symmetric_norm = symmetric_norm
        self.max_norm = max_norm
        self.clip_norm = clip_norm
        self.spec_gain = spec_gain
        self.do_trim_silence = do_trim_silence
        self.trim_db = trim_db
        self.do_sound_norm = do_sound_norm
        self.mel_basis = mel_filterbank_slaney(sample_rate, fft_size, num_mels, mel_fmin, mel_fmax)
        self.inv_mel_basis = np.linalg.pinv(self.mel_basis)
        self.window = hann_periodic(win_length)

    # --- framing / transforms -------------------------------------------------

    def _padded_window(self) -> np.ndarray:
        w = np.zeros(self.fft_size)
        off = (self.fft_size - self.win_length) // 2
        w[off: off + self.win_length] = self.window
        return w

    def _stft(self, y: np.ndarray) -> np.ndarray:
        """librosa.stft semantics; returns complex [num_freq, n_frames]."""
        pad = self.fft_size // 2
        yp = np.pad(y, pad, mode="reflect")
        n_frames = 1 + (len(yp) - self.fft_size) // self.hop_length
        w = self._padded_window()
        frames = np.stack(
            [yp[t * self.hop_length: t * self.hop_length + self.fft_size] for t in range(n_frames)]
        )
        return np.fft.rfft(frames * w[None, :], axis=-1).T

    def _istft(self, D: np.ndarray) -> np.ndarray:
        """librosa.istft semantics (windowed overlap-add, window-square norm)."""
        n_frames = D.shape[1]
        w = self._padded_window()
        expected = self.fft_size + self.hop_length * (n_frames - 1)
        y = np.zeros(expected)
        wsum = np.zeros(expected)
        frames = np.fft.irfft(D.T, n=self.fft_size, axis=-1)
        for t in range(n_frames):
            s = t * self.hop_length
            y[s: s + self.fft_size] += frames[t] * w
            wsum[s: s + self.fft_size] += w ** 2
        nz = wsum > 1e-11
        y[nz] /= wsum[nz]
        pad = self.fft_size // 2
        return y[pad: expected - pad]

    # --- scalar maps ----------------------------------------------------------

    def _amp_to_db(self, x: np.ndarray) -> np.ndarray:
        min_level = np.exp(self.min_level_db / 20.0 * np.log(10.0))
        return self.spec_gain * np.log10(np.maximum(min_level, x))

    def _db_to_amp(self, x: np.ndarray) -> np.ndarray:
        return np.power(10.0, x / self.spec_gain)

    def _linear_to_mel(self, S: np.ndarray) -> np.ndarray:
        return np.dot(self.mel_basis, S)

    def _mel_to_linear(self, M: np.ndarray) -> np.ndarray:
        return np.maximum(1e-10, np.dot(self.inv_mel_basis, M))

    def _normalize(self, S: np.ndarray) -> np.ndarray:
        if not self.signal_norm:
            return S
        S_norm = (S - self.min_level_db) / (-self.min_level_db)
        if self.symmetric_norm:
            S_norm = (2.0 * self.max_norm) * S_norm - self.max_norm
            if self.clip_norm:
                S_norm = np.clip(S_norm, -self.max_norm, self.max_norm)
        else:
            S_norm = self.max_norm * S_norm
            if self.clip_norm:
                S_norm = np.clip(S_norm, 0.0, self.max_norm)
        return S_norm

    def _denormalize(self, S: np.ndarray) -> np.ndarray:
        if not self.signal_norm:
            return S
        S_denorm = np.array(S, dtype=np.float64)
        if self.symmetric_norm:
            if self.clip_norm:
                S_denorm = np.clip(S_denorm, -self.max_norm, self.max_norm)
            S_denorm = (S_denorm + self.max_norm) / (2.0 * self.max_norm)
        else:
            if self.clip_norm:
                S_denorm = np.clip(S_denorm, 0.0, self.max_norm)
            S_denorm = S_denorm / self.max_norm
        return S_denorm * (-self.min_level_db) + self.min_level_db

    # --- preemphasis ----------------------------------------------------------

    def apply_preemphasis(self, x: np.ndarray) -> np.ndarray:
        if self.preemphasis == 0.0:
            return x
        y = np.empty_like(x, dtype=np.float64)
        y[0] = x[0]
        y[1:] = x[1:] - self.preemphasis * x[:-1]
        return y

    def apply_inv_preemphasis(self, x: np.ndarray) -> np.ndarray:
        if self.preemphasis == 0.0:
            return x
        y = np.empty_like(x, dtype=np.float64)
        acc = 0.0
        for n in range(len(x)):
            acc = x[n] + self.preemphasis * acc
            y[n] = acc
        return y

    # --- public pipelines -------------------------------------------------

    def spectrogram(self, y: np.ndarray) -> np.ndarray:
        D = self._stft(self.apply_preemphasis(y))
        S = self._amp_to_db(np.abs(D)) - self.ref_level_db
        return self._normalize(S)

    def melspectrogram(self, y: np.ndarray) -> np.ndarray:
        D = self._stft(self.apply_preemphasis(y))
        S = self._amp_to_db(self._linear_to_mel(np.abs(D))) - self.ref_level_db
        return self._normalize(S)

    def _griffin_lim(self, S: np.ndarray, rng: np.random.Generator | None = None) -> np.ndarray:
        rng = rng or np.random.default_rng(0)
        angles = np.exp(2j * np.pi * rng.random(S.shape))
        S_complex = np.abs(S).astype(np.complex128)
        y = self._istft(S_complex * angles)
        for _ in range(self.griffin_lim_iters):
            angles = np.exp(1j * np.angle(self._stft(y)))
            y = self._istft(S_complex * angles)
        return y

    def inv_spectrogram(self, spectrogram: np.ndarray) -> np.ndarray:
        S = self._denormalize(spectrogram)
        S = self._db_to_amp(S + self.ref_level_db)
        y = self._griffin_lim(S ** self.power)
        return self.apply_inv_preemphasis(y) if self.preemphasis != 0.0 else y

    def inv_melspectrogram(self, mel_spectrogram: np.ndarray) -> np.ndarray:
        D = self._denormalize(mel_spectrogram)
        S = self._mel_to_linear(self._db_to_amp(D + self.ref_level_db))
        y = self._griffin_lim(S ** self.power)
        return self.apply_inv_preemphasis(y) if self.preemphasis != 0.0 else y

    # --- silence handling -------------------------------------------------

    def _frame_rms(self, y: np.ndarray) -> np.ndarray:
        """librosa.feature.rms with center=True (pad mode constant? librosa uses pad)."""
        pad = self.win_length // 2
        yp = np.pad(y, pad, mode="constant")
        n_frames = 1 + (len(yp) - self.win_length) // self.hop_length
        out = np.empty(n_frames)
        for t in range(n_frames):
            fr = yp[t * self.hop_length: t * self.hop_length + self.win_length]
            out[t] = np.sqrt(np.mean(fr ** 2))
        return out

    def trim_silence(self, wav: np.ndarray) -> np.ndarray:
        """librosa.effects.trim(top_db=trim_db, frame_length=win_length, hop=hop)."""
        margin = int(self.sample_rate * 0.01)
        wav = wav[margin:-margin] if margin > 0 else wav
        rms = self._frame_rms(wav)
        ref = np.max(rms)
        db = 20.0 * np.log10(np.maximum(rms, 1e-10) / max(ref, 1e-10))
        non_silent = np.flatnonzero(db > -self.trim_db)
        if len(non_silent) == 0:
            return wav[:0]
        start = int(non_silent[0]) * self.hop_length
        end = min(len(wav), int(non_silent[-1] + 1) * self.hop_length)
        return wav[start:end]

    def find_endpoint(self, wav: np.ndarray, threshold_db: float = -40.0,
                      min_silence_sec: float = 0.8) -> int:
        window_length = int(self.sample_rate * min_silence_sec)
        hop = window_length // 4
        threshold = self._db_to_amp(threshold_db)
        for x in range(hop, len(wav) - window_length, hop):
            if np.max(wav[x: x + window_length]) < threshold:
                return x + hop
        return len(wav)

    def sound_norm(self, x: np.ndarray) -> np.ndarray:
        return x / np.abs(x).max() * 0.9
