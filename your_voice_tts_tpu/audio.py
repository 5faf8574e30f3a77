"""Host-facing AudioProcessor — reference API, TPU compute.

Method-for-method parity with the reference's ``utils/audio.py::
AudioProcessor`` (load_wav, save_wav, melspectrogram, spectrogram,
inv_melspectrogram, inv_spectrogram, trim_silence, find_endpoint, sound_norm;
SURVEY.md SS2.1). Numpy in, numpy out, and spectrograms in the reference's
freq-major [F, T] layout at this boundary.

Internals are TPU-first: every transform dispatches to jit-compiled programs
from ``ops.dsp`` at a small set of bucketed static shapes (wav lengths rounded
up to hop*SIG_BUCKET samples, mel lengths to FRAME_BUCKET frames), so repeated
calls with arbitrary lengths reuse a bounded set of compiled executables. File
I/O stays on host (stdlib ``wave`` + scipy resampling — the reference used
libsndfile/librosa, native deps unavailable here; SURVEY.md SS2.2).
"""

from __future__ import annotations

import wave
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .config import AudioConfig
from .ops import dsp
from .ops.filters import hann_window, inv_mel_basis, mel_basis

SIG_BUCKET = 128     # wav lengths padded to multiples of hop * SIG_BUCKET
FRAME_BUCKET = 32    # mel frame counts padded to multiples of FRAME_BUCKET


class AudioProcessor:
    def __init__(self, config: AudioConfig | None = None, **kwargs):
        if config is None:
            config = AudioConfig(**kwargs)
        elif kwargs:
            import dataclasses
            config = dataclasses.replace(config, **kwargs)
        self.cfg = config
        self.sample_rate = config.sample_rate
        self.num_mels = config.num_mels
        self.fft_size = config.fft_size
        self.hop_length, self.win_length = config.resolved_hop_win()
        self.mel_basis = mel_basis(
            config.sample_rate, config.fft_size, config.num_mels,
            config.mel_fmin, config.mel_fmax,
        ).astype(np.float32)
        self.inv_mel_basis = inv_mel_basis(self.mel_basis.astype(np.float64)).astype(np.float32)
        self.window = hann_window(self.win_length, config.fft_size).astype(np.float32)
        # mean/std scaler stats (reference stats_path -> scale_stats.npy):
        # per-bin (mean, std) over dB-minus-ref values, replacing range norm
        self.mel_stats = self.linear_stats = None
        if config.stats_path:
            stats = np.load(config.stats_path, allow_pickle=True).item()
            self.mel_stats = (np.asarray(stats["mel_mean"], np.float32),
                              np.asarray(stats["mel_std"], np.float32))
            if "linear_mean" in stats:
                self.linear_stats = (np.asarray(stats["linear_mean"], np.float32),
                                     np.asarray(stats["linear_std"], np.float32))
        self._jit_cache: dict = {}
        self._gl_key = jax.random.PRNGKey(0)
        # the HTTP server's streaming handler threads and its micro-batch
        # collator both reach Griffin-Lim concurrently; guard the key stream
        # so no two launches ever share a phase-init key
        import threading
        self._gl_key_lock = threading.Lock()

    def _next_gl_key(self):
        with self._gl_key_lock:
            self._gl_key, sub = jax.random.split(self._gl_key)
        return sub

    # --- shape bucketing -------------------------------------------------

    def _sig_bucket(self, n: int) -> int:
        q = self.hop_length * SIG_BUCKET
        return max(q, ((n + q - 1) // q) * q)

    def _frame_bucket(self, n: int) -> int:
        return max(FRAME_BUCKET, ((n + FRAME_BUCKET - 1) // FRAME_BUCKET) * FRAME_BUCKET)

    def _get_jit(self, kind: str, shape_key: int):
        key = (kind, shape_key)
        fn = self._jit_cache.get(key)
        if fn is not None:
            return fn
        c = self.cfg
        common = dict(
            window=jnp.asarray(self.window), n_fft=c.fft_size, hop=self.hop_length,
            preemph=c.preemphasis, ref_level_db=c.ref_level_db,
            min_level_db=c.min_level_db, spec_gain=c.spec_gain,
            max_norm=c.max_norm, symmetric=c.symmetric_norm, clip=c.clip_norm,
            signal_norm=c.signal_norm,
        )
        def _stats(pair):
            return None if pair is None else (jnp.asarray(pair[0]),
                                              jnp.asarray(pair[1]))

        if kind == "mel":
            fn = jax.jit(partial(dsp.melspectrogram, mel_basis=jnp.asarray(self.mel_basis),
                                 stats=_stats(self.mel_stats), **common))
        elif kind == "spec":
            fn = jax.jit(partial(dsp.spectrogram,
                                 stats=_stats(self.linear_stats), **common))
        elif kind == "inv_mel":
            fn = jax.jit(partial(
                dsp.inv_melspectrogram, mel_inv_basis=jnp.asarray(self.inv_mel_basis),
                power=c.power, gl_iters=c.griffin_lim_iters,
                gl_momentum=c.griffin_lim_momentum,
                stats=_stats(self.mel_stats), **common))
        elif kind == "inv_spec":
            fn = jax.jit(partial(
                dsp.inv_spectrogram, power=c.power, gl_iters=c.griffin_lim_iters,
                gl_momentum=c.griffin_lim_momentum,
                stats=_stats(self.linear_stats), **common))
        elif kind == "inv_mel_batch":
            fn = jax.jit(partial(
                dsp.inv_melspectrogram_batch,
                mel_inv_basis=jnp.asarray(self.inv_mel_basis),
                power=c.power, gl_iters=c.griffin_lim_iters,
                gl_momentum=c.griffin_lim_momentum, batch_invariant=True,
                stats=_stats(self.mel_stats), **common))
        elif kind == "inv_spec_batch":
            fn = jax.jit(partial(
                dsp.inv_spectrogram_batch, power=c.power,
                gl_iters=c.griffin_lim_iters,
                gl_momentum=c.griffin_lim_momentum, batch_invariant=True,
                stats=_stats(self.linear_stats), **common))
        else:
            raise KeyError(kind)
        self._jit_cache[key] = fn
        return fn

    # --- forward transforms ----------------------------------------------

    def _forward(self, kind: str, y: np.ndarray) -> np.ndarray:
        y = np.asarray(y, dtype=np.float32)
        n = len(y)
        lb = self._sig_bucket(n)
        buf = np.zeros(lb, dtype=np.float32)
        buf[:n] = y
        out = self._get_jit(kind, lb)(jnp.asarray(buf), jnp.int32(n))
        n_frames = n // self.hop_length + 1
        return np.asarray(out)[:n_frames].T  # reference layout [F, T]

    def melspectrogram(self, y: np.ndarray) -> np.ndarray:
        """wav [T] -> normalized mel [num_mels, n_frames]."""
        return self._forward("mel", y)

    def melspectrogram_batch(self, wavs: list[np.ndarray]) -> list[np.ndarray]:
        """N wavs -> N time-major mels [n_frames_i, num_mels] in ONE vmapped
        device call per length bucket (per-item dispatch is latency-bound,
        especially over a remote-TPU tunnel; dataset prep uses this)."""
        return self._forward_batch("mel", wavs)

    def spectrogram_batch(self, wavs: list[np.ndarray]) -> list[np.ndarray]:
        """N wavs -> N time-major linear specs [n_frames_i, num_freq], same
        bucketed-vmapped dispatch as melspectrogram_batch (Tacotron1's
        linear-target extraction path)."""
        return self._forward_batch("spec", wavs)

    def _forward_batch(self, kind: str, wavs: list[np.ndarray]) -> list[np.ndarray]:
        by_bucket: dict[int, list[int]] = {}
        for i, y in enumerate(wavs):
            by_bucket.setdefault(self._sig_bucket(len(y)), []).append(i)
        out: list = [None] * len(wavs)
        for lb, idxs in by_bucket.items():
            # batch dim is bucketed too (next power of two, capped) so the
            # set of compiled (length, count) variants stays small
            n = len(idxs)
            nb = 1
            while nb < min(n, 64):
                nb *= 2
            groups = [idxs[s: s + nb] for s in range(0, n, nb)]
            for g in groups:
                self._batch_group(kind, wavs, g, lb, nb, out)
        return out

    def _batch_group(self, kind: str, wavs, idxs, lb: int, nb: int,
                     out: list) -> None:
        import jax

        buf = np.zeros((nb, lb), np.float32)
        lens = np.full((nb,), self.hop_length, np.int32)  # phantom rows
        for j, i in enumerate(idxs):
            buf[j, : len(wavs[i])] = wavs[i]
            lens[j] = len(wavs[i])
        key = (f"{kind}_batch", lb, nb)
        fn = self._jit_cache.get(key)
        if fn is None:
            base = self._get_jit(kind, lb)
            fn = jax.jit(jax.vmap(lambda y, n: base(y, n)))
            self._jit_cache[key] = fn
        specs = np.asarray(fn(jnp.asarray(buf), jnp.asarray(lens)))
        for j, i in enumerate(idxs):
            n_frames = lens[j] // self.hop_length + 1
            out[i] = specs[j, :n_frames].astype(np.float32)

    def spectrogram(self, y: np.ndarray) -> np.ndarray:
        """wav [T] -> normalized linear spectrogram [num_freq, n_frames]."""
        return self._forward("spec", y)

    # --- inverse transforms (Griffin-Lim vocoder) --------------------------

    def _silence_fill(self, kind: str, n_bins: int) -> np.ndarray:
        """Per-bin NORMALIZED-silence pad row: a 0.0 pad would denormalize
        to the corpus MEAN dB (average speech energy) and Griffin-Lim's
        overlap-add would mix those energetic phantom frames into real
        audio. Mirrored by the export path's tail mask (infer/export.py)."""
        stats = self.mel_stats if kind == "inv_mel" else self.linear_stats
        if self.cfg.signal_norm and stats is not None:
            mean, std = stats
            return ((self.cfg.min_level_db - mean) /
                    np.maximum(std, 1e-8)).astype(np.float32)
        if self.cfg.signal_norm:
            pad_val = -self.cfg.max_norm if self.cfg.symmetric_norm else 0.0
        else:
            pad_val = self.cfg.min_level_db
        return np.full((n_bins,), pad_val, dtype=np.float32)

    def _inverse(self, kind: str, S: np.ndarray) -> np.ndarray:
        S = np.asarray(S, dtype=np.float32).T  # -> time-major
        t = S.shape[0]
        tb = self._frame_bucket(t)
        buf = np.broadcast_to(self._silence_fill(kind, S.shape[1]),
                              (tb, S.shape[1])).copy()
        buf[:t] = S
        sub = self._next_gl_key()
        y = self._get_jit(kind, tb)(jnp.asarray(buf), sub)
        out_len = self.hop_length * (t - 1)
        return np.asarray(y)[:out_len]

    # max rows per batched Griffin-Lim launch: bounds both the padded-row
    # waste of the power-of-2 batch bucket and the kernel's VMEM tile count
    _INV_BATCH_CAP = 128

    def _inverse_batch(self, kind: str, specs: list[np.ndarray]) -> list[np.ndarray]:
        """N spectrograms [F, T_i] -> N waveforms in ONE batched Griffin-Lim
        launch per (frame-bucket, batch-bucket) — the inverse mirror of
        `melspectrogram_batch`. Per-row dispatch is latency-bound (a batch-1
        GL launch costs nearly the same wall as a batch-32 one on TPU), so
        micro-batched serving runs its whole GL stage here. Rows are padded
        with normalized silence and the phase init is batch-invariant, so a
        row's audio does not depend on its batchmates."""
        out: list = [None] * len(specs)
        if not specs:
            return out
        groups: dict[int, list[int]] = {}
        for i, S in enumerate(specs):
            groups.setdefault(self._frame_bucket(np.asarray(S).shape[1]),
                              []).append(i)
        for tb, idxs in sorted(groups.items()):
            for lo in range(0, len(idxs), self._INV_BATCH_CAP):
                chunk = idxs[lo:lo + self._INV_BATCH_CAP]
                bb = 1 << (len(chunk) - 1).bit_length()
                n_bins = np.asarray(specs[chunk[0]]).shape[0]
                buf = np.broadcast_to(self._silence_fill(kind, n_bins),
                                      (bb, tb, n_bins)).copy()
                for j, i in enumerate(chunk):
                    S = np.asarray(specs[i], dtype=np.float32).T
                    buf[j, : S.shape[0]] = S
                sub = self._next_gl_key()
                wavs = np.asarray(
                    self._get_jit(kind + "_batch", 0)(jnp.asarray(buf), sub))
                for j, i in enumerate(chunk):
                    t = np.asarray(specs[i]).shape[1]
                    out[i] = wavs[j, : self.hop_length * (t - 1)].astype(
                        np.float32)
        return out

    def inv_melspectrogram_batch(self, mels: list[np.ndarray]) -> list[np.ndarray]:
        """N normalized mels [num_mels, T_i] -> N waveforms, length-bucketed
        batched Griffin-Lim (one device launch per shape bucket)."""
        return self._inverse_batch("inv_mel", mels)

    def inv_spectrogram_batch(self, specs: list[np.ndarray]) -> list[np.ndarray]:
        """N normalized linear specs [num_freq, T_i] -> N waveforms
        (Tacotron1's head), same bucketed batched dispatch."""
        return self._inverse_batch("inv_spec", specs)

    def inv_melspectrogram(self, mel: np.ndarray) -> np.ndarray:
        """normalized mel [num_mels, T] -> waveform (on-device Griffin-Lim)."""
        return self._inverse("inv_mel", mel)

    def inv_spectrogram(self, spec: np.ndarray) -> np.ndarray:
        """normalized linear spec [num_freq, T] -> waveform."""
        return self._inverse("inv_spec", spec)

    def out_linear_to_mel(self, linear_spec: np.ndarray) -> np.ndarray:
        """Reference helper: model linear output -> mel (for Tacotron1 eval)."""
        S = dsp.denormalize_spec(
            jnp.asarray(linear_spec.T, dtype=jnp.float32), self.cfg.min_level_db,
            self.cfg.max_norm, self.cfg.symmetric_norm, self.cfg.clip_norm,
            self.cfg.signal_norm)
        S = dsp.db_to_amp(S + self.cfg.ref_level_db, self.cfg.spec_gain)
        mel = jnp.dot(S, jnp.asarray(self.mel_basis).T,
                      precision=jax.lax.Precision.HIGHEST)
        S = dsp.amp_to_db(mel, self.cfg.spec_gain, self.cfg.min_level_db) - self.cfg.ref_level_db
        return np.asarray(dsp.normalize_spec(
            S, self.cfg.min_level_db, self.cfg.max_norm, self.cfg.symmetric_norm,
            self.cfg.clip_norm, self.cfg.signal_norm)).T

    # --- host-side signal utilities ---------------------------------------

    def load_wav(self, path: str, sr: int | None = None) -> np.ndarray:
        """WAV -> mono float32 [-1, 1], resampled to sample_rate.

        Native C++ path (PCM 8/16/24/32 + IEEE float, threaded batch-capable,
        scipy-parity polyphase resampler) with a pure-Python fallback
        (PCM 16/32 via the stdlib `wave` module + scipy resample_poly).
        """
        from math import gcd

        target_sr = sr or self.sample_rate
        from . import native
        x = None
        if native.available():
            try:
                x, file_sr = native.decode(path)
                if file_sr != target_sr:
                    g = gcd(file_sr, target_sr)
                    x = native.resample_poly(x, target_sr // g, file_sr // g)
            except native.NativeWavError:
                x = None  # fall through: the stdlib reader handles some
                # files the strict native parser rejects (e.g. truncated
                # PCM16 with a short final read)
        if x is None:
            with wave.open(path, "rb") as f:
                n_ch = f.getnchannels()
                width = f.getsampwidth()
                file_sr = f.getframerate()
                raw = f.readframes(f.getnframes())
            if width == 2:
                x = np.frombuffer(raw, dtype=np.int16).astype(np.float32) / 32768.0
            elif width == 4:
                x = np.frombuffer(raw, dtype=np.int32).astype(np.float32) / 2147483648.0
            else:
                raise ValueError(f"unsupported WAV sample width: {width}")
            if n_ch > 1:
                x = x.reshape(-1, n_ch).mean(axis=1)
            if file_sr != target_sr:
                from scipy.signal import resample_poly
                g = gcd(file_sr, target_sr)
                x = resample_poly(x, target_sr // g, file_sr // g).astype(np.float32)
        if self.cfg.do_sound_norm:
            x = self.sound_norm(x)
        return x.astype(np.float32)

    def load_wav_batch(self, paths: list[str],
                       sr: int | None = None) -> list[np.ndarray]:
        """Decode many WAVs at once (native threaded path when available)."""
        target_sr = sr or self.sample_rate
        from . import native
        if native.available():
            waves, _ = native.decode_batch(paths, target_sr=target_sr)
            out = []
            for p, w in zip(paths, waves):
                if w is None:  # fall back per-file for exotic failures
                    out.append(self.load_wav(p, sr=target_sr))
                elif self.cfg.do_sound_norm:
                    out.append(self.sound_norm(w).astype(np.float32))
                else:
                    out.append(w)
            return out
        return [self.load_wav(p, sr=target_sr) for p in paths]

    def save_wav(self, wav: np.ndarray, path: str, sr: int | None = None) -> None:
        """Peak-normalized int16 WAV (reference: scipy.io.wavfile + 32767 scale)."""
        wav_norm = wav * (32767 / max(0.01, float(np.max(np.abs(wav)))))
        pcm = wav_norm.astype(np.int16)
        with wave.open(path, "wb") as f:
            f.setnchannels(1)
            f.setsampwidth(2)
            f.setframerate(sr or self.sample_rate)
            f.writeframes(pcm.tobytes())

    def trim_silence(self, wav: np.ndarray) -> np.ndarray:
        """librosa.effects.trim semantics (top_db=trim_db, win/hop framing)."""
        margin = int(self.sample_rate * 0.01)
        if margin > 0:
            wav = wav[margin:-margin]
        pad = self.win_length // 2
        yp = np.pad(wav, pad)
        n_frames = max(0, 1 + (len(yp) - self.win_length) // self.hop_length)
        if n_frames == 0:
            return wav
        idx = (np.arange(n_frames) * self.hop_length)[:, None] + np.arange(self.win_length)[None, :]
        rms = np.sqrt(np.mean(yp[idx] ** 2, axis=1))
        ref = max(float(np.max(rms)), 1e-10)
        db = 20.0 * np.log10(np.maximum(rms, 1e-10) / ref)
        keep = np.flatnonzero(db > -self.cfg.trim_db)
        if len(keep) == 0:
            return wav[:0]
        start = int(keep[0]) * self.hop_length
        end = min(len(wav), int(keep[-1] + 1) * self.hop_length)
        return wav[start:end]

    def find_endpoint(self, wav: np.ndarray, threshold_db: float = -40.0,
                      min_silence_sec: float = 0.8) -> int:
        window_length = int(self.sample_rate * min_silence_sec)
        hop = window_length // 4
        threshold = 10.0 ** (threshold_db / self.cfg.spec_gain)
        for x in range(hop, len(wav) - window_length, hop):
            if np.max(np.abs(wav[x: x + window_length])) < threshold:
                return x + hop
        return len(wav)

    def sound_norm(self, x: np.ndarray) -> np.ndarray:
        return x / (np.abs(x).max() + 1e-8) * 0.9
