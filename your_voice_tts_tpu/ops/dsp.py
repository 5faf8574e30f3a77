"""JAX DSP transforms — the TPU compute path for the audio layer.

This is the reference AudioProcessor's math (reference: utils/audio.py;
SURVEY.md SS2.1 "AudioProcessor") rebuilt as pure, jit-compiled functions with
TPU-first structure:

- Static shapes: signals live in fixed-size (bucketed) buffers; the true
  sample count is a traced scalar. Reflect padding and framing are ONE gather
  with mirror-index arithmetic, so a whole batch of variable-length clips
  compiles to a single XLA program — no per-length recompiles, no host loop.
- The mel projection is a [T, n_freq] x [n_freq, n_mels] matmul (MXU) with the
  dB conversion and normalization fused behind it by XLA.
- Griffin-Lim is a `lax.fori_loop` of rFFT/irFFT phase projections, entirely
  on-device (the reference iterates librosa stft/istft on host CPU).
- The de-emphasis IIR y[n] = x[n] + a*y[n-1] uses `lax.associative_scan`
  (log-depth) instead of a sequential sample loop.

All functions are batched-friendly: leading dims are preserved or vmapped at
the call site. Spectrograms here are TIME-MAJOR [..., T, F]; the host-facing
AudioProcessor transposes to the reference's [F, T] layout at the boundary.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


# --- preemphasis -------------------------------------------------------------

def preemphasis(y: jnp.ndarray, coef: float) -> jnp.ndarray:
    """y[n] - coef*y[n-1] (y[0] passes through), along the last axis."""
    if coef == 0.0:
        return y
    prev = jnp.pad(y[..., :-1], [(0, 0)] * (y.ndim - 1) + [(1, 0)])
    return y - coef * prev


def inv_preemphasis(y: jnp.ndarray, coef: float) -> jnp.ndarray:
    """IIR 1/(1 - coef z^-1) via associative scan (log-depth on TPU)."""
    if coef == 0.0:
        return y

    def combine(c1, c2):
        a1, b1 = c1
        a2, b2 = c2
        return a1 * a2, a2 * b1 + b2

    a = jnp.full_like(y, coef)
    _, out = lax.associative_scan(combine, (a, y), axis=-1)
    return out


# --- framing / STFT ----------------------------------------------------------

def _mirror_indices(length: jnp.ndarray, l_max: int, n_fft: int, hop: int) -> jnp.ndarray:
    """Gather indices implementing librosa's center=True reflect padding.

    Returns [n_frames_max, n_fft] int32 positions into the (unpadded) signal
    buffer for a clip whose true length is `length` (traced). Frames past the
    clip's valid count read mirrored/clamped junk and must be masked by the
    caller.
    """
    pad = n_fft // 2
    n_frames_max = l_max // hop + 1
    t = lax.broadcasted_iota(jnp.int32, (n_frames_max, n_fft), 0)
    k = lax.broadcasted_iota(jnp.int32, (n_frames_max, n_fft), 1)
    p = t * hop + k - pad
    p = jnp.abs(p)                                   # left reflect
    p = jnp.where(p >= length, 2 * length - 2 - p, p)  # right reflect
    return jnp.clip(p, 0, l_max - 1)


def _frame_banded(y: jnp.ndarray, length: jnp.ndarray, n_fft: int, hop: int,
                  window: jnp.ndarray) -> jnp.ndarray:
    """Framing WITHOUT the big gather: when hop | n_fft and hop | pad, frame t
    is the concatenation of K = n_fft/hop consecutive hop-sized chunks of the
    reflect-padded signal, so framing lowers to K static slices of a reshape —
    HBM-bound instead of gather-bound (measured on v5e: the [T, n_fft] mirror
    gather took 354ms for 64x5s of audio vs a 0.14ms memory floor; this path
    is ~100x faster end-to-end).

    Reflect padding: the left pad is a static reversed slice; the right pad
    (which depends on the traced `length`) is a pad-sized gather (tiny)
    written at the traced offset. Exactness vs _mirror_indices holds for
    length >= pad; shorter clips differ only in frames the caller masks.
    """
    L = y.shape[-1]
    pad = n_fft // 2
    K = n_fft // hop
    n_frames = L // hop + 1
    left = y[1: pad + 1][::-1]
    ridx = length - 2 - jnp.arange(pad)
    right = jnp.take(y, jnp.clip(ridx, 0, L - 1), axis=-1)
    padded = jnp.concatenate(
        [left, y, jnp.zeros((pad,), y.dtype)], axis=-1)  # [pad + L + pad]
    padded = lax.dynamic_update_slice(padded, right, (pad + length,))
    C = padded.reshape(-1, hop)                     # [(L + 2*pad)/hop, hop]
    parts = [lax.slice_in_dim(C, k, k + n_frames, axis=0) for k in range(K)]
    return jnp.concatenate(parts, axis=-1) * window[None, :]


def frame_signal(y: jnp.ndarray, length: jnp.ndarray, n_fft: int, hop: int,
                 window: jnp.ndarray) -> jnp.ndarray:
    """[L_max] (+ true length) -> windowed frames [n_frames_max, n_fft]."""
    pad = n_fft // 2
    if n_fft % hop == 0 and pad % hop == 0 and y.shape[-1] % hop == 0:
        return _frame_banded(y, length, n_fft, hop, window)
    idx = _mirror_indices(length, y.shape[-1], n_fft, hop)
    return y[idx] * window[None, :]


def stft(y: jnp.ndarray, length: jnp.ndarray, n_fft: int, hop: int,
         window: jnp.ndarray) -> jnp.ndarray:
    """Complex STFT, time-major [n_frames_max, n_fft//2+1]."""
    return jnp.fft.rfft(frame_signal(y, length, n_fft, hop, window), axis=-1)


def stft_magnitude(y, length, n_fft, hop, window):
    return jnp.abs(stft(y, length, n_fft, hop, window))


def num_frames(length, hop: int):
    """Valid frame count for a clip of `length` samples (center=True)."""
    return length // hop + 1


def istft(D: jnp.ndarray, n_fft: int, hop: int, window: jnp.ndarray) -> jnp.ndarray:
    """Inverse STFT (librosa semantics): windowed overlap-add, wsum-normalized.

    D: complex, time-major [n_frames, n_freq]. Returns [hop * (n_frames - 1)]
    samples (center padding removed).
    """
    n_frames = D.shape[-2]
    frames = jnp.fft.irfft(D, n=n_fft, axis=-1) * window
    total = n_fft + hop * (n_frames - 1)
    pad = n_fft // 2
    if n_fft % hop == 0 and D.ndim == 2:
        # banded overlap-add: output chunk c (hop samples) is the sum of
        # band k of frame c-k over K = n_fft/hop bands — K static pads+adds
        # instead of a [T, n_fft] scatter (same reasoning as _frame_banded:
        # XLA scatters with computed 2D indices are ~1000x off the HBM floor)
        K = n_fft // hop
        fb = frames.reshape(n_frames, K, hop)
        wb = (window ** 2).reshape(K, hop)
        y = jnp.zeros((n_frames + K - 1, hop), frames.dtype)
        wsum = jnp.zeros((n_frames + K - 1, hop), window.dtype)
        ones = jnp.ones((n_frames, 1), window.dtype)
        for k in range(K):
            y = y + jnp.pad(fb[:, k], ((k, K - 1 - k), (0, 0)))
            wsum = wsum + jnp.pad(ones * wb[k], ((k, K - 1 - k), (0, 0)))
        y = y.reshape(total)
        wsum = wsum.reshape(total)
        y = jnp.where(wsum > 1e-11, y / jnp.maximum(wsum, 1e-11), y)
        return y[pad: total - pad]
    pos = (jnp.arange(n_frames) * hop)[:, None] + jnp.arange(n_fft)[None, :]
    y = jnp.zeros(D.shape[:-2] + (total,), frames.dtype).at[..., pos].add(frames)
    wsum = jnp.zeros((total,), window.dtype).at[pos].add(window ** 2)
    y = jnp.where(wsum > 1e-11, y / jnp.maximum(wsum, 1e-11), y)
    return y[..., pad: total - pad]


# --- scalar maps -------------------------------------------------------------

def amp_to_db(x, spec_gain: float = 20.0, min_level_db: float = -100.0):
    min_level = jnp.exp(min_level_db / 20.0 * jnp.log(10.0))
    return spec_gain * jnp.log10(jnp.maximum(min_level, x))


def db_to_amp(x, spec_gain: float = 20.0):
    return jnp.power(10.0, x / spec_gain)


def normalize_spec(S, min_level_db: float, max_norm: float,
                   symmetric: bool, clip: bool, signal_norm: bool = True,
                   stats=None):
    """Range normalization, or per-bin mean/std scaling when `stats`
    (mean [F], std [F]) is given (reference `stats_path`/scale_stats.npy
    scaler path; operates on the same dB-minus-ref values)."""
    if not signal_norm:
        return S
    if stats is not None:
        mean, std = stats
        return (S - mean) / jnp.maximum(std, 1e-8)
    S_norm = (S - min_level_db) / (-min_level_db)
    if symmetric:
        S_norm = 2.0 * max_norm * S_norm - max_norm
        return jnp.clip(S_norm, -max_norm, max_norm) if clip else S_norm
    S_norm = max_norm * S_norm
    return jnp.clip(S_norm, 0.0, max_norm) if clip else S_norm


def denormalize_spec(S, min_level_db: float, max_norm: float,
                     symmetric: bool, clip: bool, signal_norm: bool = True,
                     stats=None):
    if not signal_norm:
        return S
    if stats is not None:
        mean, std = stats
        return S * jnp.maximum(std, 1e-8) + mean
    if symmetric:
        if clip:
            S = jnp.clip(S, -max_norm, max_norm)
        S = (S + max_norm) / (2.0 * max_norm)
    else:
        if clip:
            S = jnp.clip(S, 0.0, max_norm)
        S = S / max_norm
    return S * (-min_level_db) + min_level_db


# --- full pipelines ----------------------------------------------------------

def melspectrogram(y: jnp.ndarray, length: jnp.ndarray, *, mel_basis: jnp.ndarray,
                   window: jnp.ndarray, n_fft: int, hop: int, preemph: float,
                   ref_level_db: float, min_level_db: float, spec_gain: float,
                   max_norm: float, symmetric: bool, clip: bool,
                   signal_norm: bool = True, stats=None) -> jnp.ndarray:
    """Normalized mel spectrogram, time-major [n_frames_max, n_mels].

    Exact pipeline parity with reference melspectrogram():
    preemphasis -> |STFT| -> mel matmul -> amp_to_db - ref -> normalize.
    """
    mag = stft_magnitude(preemphasis(y, preemph), length, n_fft, hop, window)
    # HIGHEST precision: this matmul is parity-facing (<=1e-3 vs CPU oracle);
    # the MXU's default bf16 passes cost ~1e-2 absolute error in dB domain.
    mel = jnp.dot(mag, mel_basis.T, preferred_element_type=jnp.float32,
                  precision=lax.Precision.HIGHEST)
    S = amp_to_db(mel, spec_gain, min_level_db) - ref_level_db
    return normalize_spec(S, min_level_db, max_norm, symmetric, clip,
                          signal_norm, stats)


def spectrogram(y: jnp.ndarray, length: jnp.ndarray, *, window: jnp.ndarray,
                n_fft: int, hop: int, preemph: float, ref_level_db: float,
                min_level_db: float, spec_gain: float, max_norm: float,
                symmetric: bool, clip: bool, signal_norm: bool = True,
                stats=None) -> jnp.ndarray:
    """Normalized linear spectrogram, time-major [n_frames_max, n_freq]."""
    mag = stft_magnitude(preemphasis(y, preemph), length, n_fft, hop, window)
    S = amp_to_db(mag, spec_gain, min_level_db) - ref_level_db
    return normalize_spec(S, min_level_db, max_norm, symmetric, clip,
                          signal_norm, stats)


def _dft_matrices(n_fft: int):
    """Real DFT matrices for rfft/irfft as MXU matmuls (cached, numpy).

    Returns (C [N,K], S [N,K], iC [K,N], iS [K,N]) with
    rfft(x) = (x@C) - i*(x@S) and irfft(Fr,Fi) = Fr@iC - Fi@iS.
    """
    import numpy as _np

    K = n_fft // 2 + 1
    n = _np.arange(n_fft)[:, None]
    k = _np.arange(K)[None, :]
    ang = 2.0 * _np.pi * n * k / n_fft
    C = _np.cos(ang)
    S = _np.sin(ang)
    w = _np.full((K,), 2.0)
    w[0] = 1.0
    if n_fft % 2 == 0:
        w[-1] = 1.0
    iC = (w[:, None] * C.T) / n_fft
    iS = (w[:, None] * S.T) / n_fft
    return (C.astype(_np.float32), S.astype(_np.float32),
            iC.astype(_np.float32), iS.astype(_np.float32))


def _banded_ola(xw, window: jnp.ndarray, n_fft: int, hop: int):
    """Shared banded overlap-add core of the frame-domain GL projection:
    K shifted adds (pure VPU, no scatter/gather) + the interior OLA
    window-square normalization (constant in t, periodic within the frame).
    ONE definition for the f32 FFT path and the bf16 matmul path — see also
    ops/pallas/griffin_lim.ola_wsum_inv for the in-kernel constant."""
    K = -(-n_fft // hop) - 1
    acc = xw
    for k in range(1, K + 1):
        s = k * hop
        # neighbor t+k contributes its first N-s samples to our last N-s
        # slots; neighbor t-k its last N-s samples to our first N-s slots
        fwd = jnp.pad(xw[..., k:, : n_fft - s],
                      [(0, 0)] * (xw.ndim - 2) + [(0, k), (s, 0)])
        bwd = jnp.pad(xw[..., :-k, s:],
                      [(0, 0)] * (xw.ndim - 2) + [(k, 0), (0, s)])
        acc = acc + fwd + bwd
    wsum = jnp.zeros((n_fft,))
    for k in range(-K, K + 1):
        s = k * hop
        if s > 0:
            wsum = wsum.at[s:].add(window[: n_fft - s] ** 2)
        elif s < 0:
            wsum = wsum.at[: n_fft + s].add(window[-s:] ** 2)
        else:
            wsum = wsum + window ** 2
    return acc / jnp.maximum(wsum, 1e-11)


def _gl_project_frames_matmul(Fr, Fi, window, n_fft: int, hop: int,
                              dtype=jnp.bfloat16):
    """Real-arithmetic variant of `_gl_project_frames`: the rFFT/irFFT pair
    becomes four [.., T, K/N] x [K/N, N/K] matmuls on the MXU (XLA's TPU FFT
    is VPU-bound and slower at these sizes). Works on (real, imag) pairs.

    DFT matmuls run in bf16 with f32 accumulation by default (4x MXU rate on
    v5e; phase recovery is a fixed-point iteration and tolerates the ~4e-3
    relative rounding — quality gated by the GL reconstruction test)."""
    C, S, iC, iS = (jnp.asarray(m, dtype) for m in _dft_matrices(n_fft))

    def dot(a, b):
        return jnp.dot(a.astype(dtype), b, preferred_element_type=jnp.float32)

    xw = (dot(Fr, iC) - dot(Fi, iS)) * window
    g = _banded_ola(xw, window, n_fft, hop) * window
    Gr = dot(g, C)
    Gi = -dot(g, S)
    return Gr, Gi


def _gl_project_frames(F: jnp.ndarray, window: jnp.ndarray, n_fft: int,
                       hop: int) -> jnp.ndarray:
    """One Griffin-Lim projection stft(istft(F)) computed ENTIRELY in the
    frame domain — the hot inner op of the GL loop.

    istft->stft materializes the waveform with a scatter-add (overlap-add)
    then re-frames it with a gather; on TPU those dominate Griffin-Lim's cost
    (profiled: GL is ~97% of end-to-end synthesis time, and scatter/gather is
    most of GL). But the composition maps frames to frames through a BANDED
    linear op: output frame t only needs input frames t-K..t+K
    (K = n_fft/hop - 1). So: irfft -> synthesis window -> K shifted adds
    (pure VPU, no scatter/gather) -> window-square normalize -> analysis
    window -> rfft. Exact for interior frames; the <=K frames at each edge
    differ from librosa's reflect-padding, which is immaterial inside an
    iterative phase-recovery loop.
    """
    xw = jnp.fft.irfft(F, n=n_fft, axis=-1) * window          # [.., T, N]
    g = _banded_ola(xw, window, n_fft, hop)
    return jnp.fft.rfft(g * window, axis=-1)


def griffin_lim(S_mag: jnp.ndarray, key: jax.Array, *, n_iters: int, n_fft: int,
                hop: int, window: jnp.ndarray, fast: bool = True,
                momentum: float = 0.0,
                init_phase: jnp.ndarray | None = None) -> jnp.ndarray:
    """Phase recovery by iterative STFT projection, fully on-device.

    S_mag: time-major magnitudes [n_frames, n_freq]. The reference loops
    librosa stft/istft on host (utils/audio.py _griffin_lim); here each
    iteration is one banded frame-domain projection (`_gl_project_frames`)
    inside a single `lax.fori_loop`; `fast=False` falls back to the literal
    istft/stft composition.

    momentum > 0 enables accelerated Griffin-Lim (FGLA, Perraudin et al.
    2013): the projection output is extrapolated against the previous one,
    t_n = G_n + m (G_n - G_{n-1}), before re-imposing the magnitudes —
    same per-iteration cost, roughly half the iterations for equal error.
    """
    n_frames = S_mag.shape[-2]
    out_len = hop * (n_frames - 1)
    phase = jax.random.uniform(
        key, S_mag.shape, minval=0.0, maxval=2.0 * jnp.pi) \
        if init_phase is None else init_phase
    angles = jnp.exp(1j * phase.astype(jnp.float32))
    S_c = S_mag.astype(jnp.complex64)

    if fast:
        # real-arithmetic loop: phase carried as (cos, sin); DFTs as matmuls
        m = jnp.float32(momentum)

        def body(_, carry):
            ar, ai, pr, pi = carry
            Gr, Gi = _gl_project_frames_matmul(S_mag * ar, S_mag * ai,
                                               window, n_fft, hop)
            tr = Gr + m * (Gr - pr)
            ti = Gi + m * (Gi - pi)
            # unit phase as t/|t| — same as exp(i*angle(t)) without the
            # atan2/sin/cos transcendentals
            mag = jnp.maximum(jnp.sqrt(tr * tr + ti * ti), 1e-16)
            return tr / mag, ti / mag, Gr, Gi

        ar0, ai0 = jnp.cos(phase), jnp.sin(phase)
        ar, ai, _, _ = lax.fori_loop(
            0, n_iters, body, (ar0, ai0, S_mag * ar0, S_mag * ai0))
        angles = lax.complex(ar.astype(jnp.float32), ai.astype(jnp.float32))
        return istft(S_c * angles, n_fft, hop, window)

    def gl_stft(y):
        # y already has center padding trimmed; length is exact & static here.
        return stft(y, jnp.int32(out_len), n_fft, hop, window)[..., :n_frames, :]

    y0 = istft(S_c * angles, n_fft, hop, window)

    def body(_, y):
        ang = jnp.exp(1j * jnp.angle(gl_stft(y)))
        return istft(S_c * ang, n_fft, hop, window)

    return lax.fori_loop(0, n_iters, body, y0)


def griffin_lim_batch(S_mag: jnp.ndarray, key: jax.Array, *, n_iters: int,
                      n_fft: int, hop: int, window: jnp.ndarray,
                      use_pallas: bool | None = None,
                      momentum: float = 0.0,
                      batch_invariant: bool = False) -> jnp.ndarray:
    """Batched Griffin-Lim: magnitudes [B, T, n_freq] -> waveforms [B, L].

    On TPU the iteration runs as the fused Pallas kernel
    (ops/pallas/griffin_lim.py: DFT matmuls + banded OLA + phase projection
    in one pass, HBM traffic = read F + S_mag, write F' per iteration);
    elsewhere it vmaps the XLA fast path.

    batch_invariant=True draws ONE phase-init pattern [T, n_freq] from `key`
    shared by every row, instead of per-row draws whose values depend on the
    batch size and row position. Every other inference stage is already
    row-independent, so this makes a served request's audio a pure function
    of (its inputs, seed) — identical bytes no matter which batchmates the
    serving micro-batcher packed alongside it. Quality is unaffected (rows
    have different magnitudes; trajectories decorrelate immediately). Costs
    one extra HBM read of the init phase on the Pallas whole-loop path.
    """
    B, T = S_mag.shape[0], S_mag.shape[1]
    if use_pallas is None:
        # B=1 is latency-bound: the XLA fast path wins (fewer launches);
        # batched magnitudes go through the fused Pallas iteration kernel
        use_pallas = jax.default_backend() == "tpu" and B > 1
    shared_phase = None
    if batch_invariant:
        shared_phase = jax.random.uniform(
            key, S_mag.shape[1:], minval=0.0, maxval=2.0 * jnp.pi)
    if use_pallas:
        from .pallas.capacity import gl_max_tile
        if T <= gl_max_tile(n_fft):
            # whole GL loop in-kernel: per-tile VMEM residency fits (budget
            # derived from the device's VMEM in capacity.py; validated on
            # v5e through 1024-frame tiles, reconstruction err/sig 0.175 —
            # which covers the model's entire serving range:
            # max_decoder_steps=500 x r=2 = 1000 frames)
            seed = jax.random.randint(key, (), 0, 2 ** 31 - 1)
            init_phase = None if shared_phase is None else \
                jnp.broadcast_to(shared_phase[None], S_mag.shape)
            c0 = n_fft // 2 - hop
            if T >= 2 and c0 >= 0 and c0 % 128 == 0 and hop % 128 == 0:
                # istft fused in-kernel (saves the whole separate XLA istft
                # pass — 73.8 ms vs the 162 ms GL kernel at B=384 x T=500 on
                # v5e). The 128-alignment guard keeps the in-kernel waveform
                # column slice on Mosaic's lane grid; every standard config
                # (hop = n_fft/4, hop % 128 == 0) satisfies it
                from .pallas.griffin_lim import griffin_lim_pallas_wave

                return griffin_lim_pallas_wave(
                    S_mag, seed, n_iters=n_iters, n_fft=n_fft, hop=hop,
                    window=window, momentum=momentum, init_phase=init_phase)
            from .pallas.griffin_lim import griffin_lim_pallas_full

            F = griffin_lim_pallas_full(S_mag, seed, n_iters=n_iters,
                                        n_fft=n_fft, hop=hop, window=window,
                                        momentum=momentum,
                                        init_phase=init_phase)
            return jax.vmap(lambda Fb: istft(Fb, n_fft, hop, window))(F)
        from .pallas.griffin_lim import griffin_lim_pallas_batch

        # the per-iteration fallback (T > 1024, outside the model's serving
        # range) runs plain GL — its kernel emits the re-magnituded spectrum,
        # so the FGLA extrapolation term is not recoverable there
        angles = griffin_lim_pallas_batch(S_mag, key, n_iters=n_iters,
                                          n_fft=n_fft, hop=hop, window=window,
                                          init_phase=shared_phase)
        S_c = S_mag.astype(jnp.complex64) * angles
        return jax.vmap(lambda F: istft(F, n_fft, hop, window))(S_c)
    if batch_invariant:
        return jax.vmap(lambda s: griffin_lim(
            s, key, n_iters=n_iters, n_fft=n_fft, hop=hop, window=window,
            momentum=momentum, init_phase=shared_phase))(S_mag)
    keys = jax.random.split(key, S_mag.shape[0])
    return jax.vmap(lambda s, k: griffin_lim(
        s, k, n_iters=n_iters, n_fft=n_fft, hop=hop, window=window,
        momentum=momentum))(S_mag, keys)


def inv_melspectrogram_batch(mel_norm: jnp.ndarray, key: jax.Array, *,
                             mel_inv_basis: jnp.ndarray, window: jnp.ndarray,
                             n_fft: int, hop: int, preemph: float,
                             ref_level_db: float, min_level_db: float,
                             spec_gain: float, max_norm: float, symmetric: bool,
                             clip: bool, power: float, gl_iters: int,
                             signal_norm: bool = True, stats=None,
                             use_pallas: bool | None = None,
                             gl_momentum: float = 0.0,
                             batch_invariant: bool = False) -> jnp.ndarray:
    """Batched normalized mel [B, T, n_mels] -> waveforms [B, L]."""
    D = denormalize_spec(mel_norm, min_level_db, max_norm, symmetric, clip,
                         signal_norm, stats)
    S = mel_to_linear(db_to_amp(D + ref_level_db, spec_gain), mel_inv_basis)
    y = griffin_lim_batch(S ** power, key, n_iters=gl_iters, n_fft=n_fft,
                          hop=hop, window=window, use_pallas=use_pallas,
                          momentum=gl_momentum,
                          batch_invariant=batch_invariant)
    return inv_preemphasis(y, preemph)


def inv_spectrogram_batch(spec_norm: jnp.ndarray, key: jax.Array, *,
                          window: jnp.ndarray, n_fft: int, hop: int,
                          preemph: float, ref_level_db: float,
                          min_level_db: float, spec_gain: float,
                          max_norm: float, symmetric: bool, clip: bool,
                          power: float, gl_iters: int,
                          signal_norm: bool = True, stats=None,
                          use_pallas: bool | None = None,
                          gl_momentum: float = 0.0,
                          batch_invariant: bool = False) -> jnp.ndarray:
    """Batched normalized linear spec [B, T, n_freq] -> waveforms [B, L]
    (Tacotron1's output head; inv_melspectrogram_batch minus mel pinv)."""
    D = denormalize_spec(spec_norm, min_level_db, max_norm, symmetric, clip,
                         signal_norm, stats)
    S = db_to_amp(D + ref_level_db, spec_gain)
    y = griffin_lim_batch(S ** power, key, n_iters=gl_iters, n_fft=n_fft,
                          hop=hop, window=window, use_pallas=use_pallas,
                          momentum=gl_momentum,
                          batch_invariant=batch_invariant)
    return inv_preemphasis(y, preemph)


def mel_to_linear(M: jnp.ndarray, inv_basis: jnp.ndarray) -> jnp.ndarray:
    """Time-major mel [T, n_mels] -> linear magnitude [T, n_freq] (pinv, floored)."""
    lin = jnp.dot(M, inv_basis.T, preferred_element_type=jnp.float32,
                  precision=lax.Precision.HIGHEST)
    return jnp.maximum(1e-10, lin)


def inv_melspectrogram(mel_norm: jnp.ndarray, key: jax.Array, *,
                       mel_inv_basis: jnp.ndarray, window: jnp.ndarray,
                       n_fft: int, hop: int, preemph: float, ref_level_db: float,
                       min_level_db: float, spec_gain: float, max_norm: float,
                       symmetric: bool, clip: bool, power: float,
                       gl_iters: int, signal_norm: bool = True,
                       stats=None, gl_momentum: float = 0.0) -> jnp.ndarray:
    """Normalized mel [T, n_mels] -> waveform (reference inv_melspectrogram)."""
    D = denormalize_spec(mel_norm, min_level_db, max_norm, symmetric, clip,
                         signal_norm, stats)
    S = mel_to_linear(db_to_amp(D + ref_level_db, spec_gain), mel_inv_basis)
    y = griffin_lim(S ** power, key, n_iters=gl_iters, n_fft=n_fft, hop=hop,
                    window=window, momentum=gl_momentum)
    return inv_preemphasis(y, preemph)


def inv_spectrogram(spec_norm: jnp.ndarray, key: jax.Array, *, window: jnp.ndarray,
                    n_fft: int, hop: int, preemph: float, ref_level_db: float,
                    min_level_db: float, spec_gain: float, max_norm: float,
                    symmetric: bool, clip: bool, power: float, gl_iters: int,
                    signal_norm: bool = True, stats=None,
                    gl_momentum: float = 0.0) -> jnp.ndarray:
    """Normalized linear spec [T, n_freq] -> waveform (reference inv_spectrogram)."""
    D = denormalize_spec(spec_norm, min_level_db, max_norm, symmetric, clip,
                         signal_norm, stats)
    S = db_to_amp(D + ref_level_db, spec_gain)
    y = griffin_lim(S ** power, key, n_iters=gl_iters, n_fft=n_fft, hop=hop,
                    window=window, momentum=gl_momentum)
    return inv_preemphasis(y, preemph)
