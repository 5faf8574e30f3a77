"""WaveRNN generation as a single Pallas TPU kernel.

The sample loop is the hottest op in the whole framework (SURVEY.md SS7 hard
part #1): 2 GRUs + 3 FCs per output sample, 22k samples per second of audio.
Under plain XLA (`lax.scan`), every step re-reads ~17 MB of weights from HBM —
the loop is pure HBM-bandwidth burn.

This kernel keeps ALL weights resident in VMEM for the entire utterance:

- grid = (n_chunks,): TPU Pallas grids run SEQUENTIALLY, so VMEM scratch
  (GRU hidden states, previous sample) persists across grid steps — the grid
  IS the outer sample loop, chunked.
- weight inputs use constant index_maps, so Mosaic DMAs them into VMEM once
  and skips the re-fetch on every later grid step.
- the conditioning stream [L, B, C] is blocked over the grid; Pallas
  double-buffers the next chunk's DMA behind the current chunk's compute.
- sampling runs in-kernel for every I/O mode (mu-law categorical via
  Gumbel-argmax, mixture-of-logistics, Gaussian), driven by a counter-based
  hash PRNG keyed on (seed, global sample index) — deterministic across
  backends and chunk sizes (pltpu.prng_random_bits is signed and returns
  zeros under interpret mode; see _uniform).

Batch rows B are the FOLDS of batched sequence folding, so the per-step
matmuls are [B, 512] x [512, 1536] MXU ops instead of vector-matrix products.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F32 = jnp.float32


def _gru(x_part, h, wh, bh):
    """Gate math given precomputed input part (x @ wx + bx) and hidden h.
    Gate order (r, z, n), torch semantics: n = tanh(nx + r * (wh_n h + bh_n))."""
    gh = jnp.dot(h, wh, preferred_element_type=F32) + bh
    H = h.shape[-1]
    rx, zx, nx = x_part[..., :H], x_part[..., H:2 * H], x_part[..., 2 * H:]
    rh, zh, nh = gh[..., :H], gh[..., H:2 * H], gh[..., 2 * H:]
    r = jax.nn.sigmoid(rx + rh)
    z = jax.nn.sigmoid(zx + zh)
    n = jnp.tanh(nx + r * nh)
    return (1.0 - z) * n + z * h


# Counter-based in-kernel PRNG. pltpu.prng_random_bits silently returns
# zeros under interpret mode (observed on this jax), which makes sampling
# untestable off-TPU; a murmur3-finalizer hash over (seed, global step, call
# salt, element index) gives identical, chunk-invariant draws on every
# backend for a handful of integer VPU ops per sample. int32 arithmetic
# wraps mod 2^32 in XLA, so the uint32 hash constants are pre-wrapped.
_C1 = 0x85EBCA6B - (1 << 32)
_C2 = 0xC2B2AE35 - (1 << 32)
_GOLD = 0x9E3779B9 - (1 << 32)


def _fmix32(x):
    x = x ^ lax.shift_right_logical(x, 16)
    x = x * np.int32(_C1)
    x = x ^ lax.shift_right_logical(x, 13)
    x = x * np.int32(_C2)
    x = x ^ lax.shift_right_logical(x, 16)
    return x


def _uniform(shape, key, salt: int):
    """Uniform(0,1) strictly inside (0,1); key is a traced int32 scalar
    unique per (seed, sample step)."""
    r = lax.broadcasted_iota(jnp.int32, shape, 0)
    c = lax.broadcasted_iota(jnp.int32, shape, len(shape) - 1)
    lin = r * np.int32(shape[-1]) + c
    x = _fmix32(lin * np.int32(_GOLD) + key + np.int32(salt * 7919))
    mant = x & np.int32(0xFFFFFF)                  # 24 mantissa-safe bits
    return (mant.astype(F32) + 0.5) * (1.0 / 16777216.0)


def _sample_mulaw(logits, key, bits: int, greedy: bool):
    """Returns (x_next, sample): the next-step RNN input uses the LINEAR
    class scaling the net trained on (label_to_float); only the emitted
    audio is mu-law decoded — wavernn.py _sample_output parity."""
    mu = float(2 ** bits - 1)
    log1p_mu = float(np.log1p(mu))
    if greedy:
        cls = jnp.argmax(logits, axis=-1)
    else:
        g = -jnp.log(-jnp.log(_uniform(logits.shape, key, 0)))  # Gumbel
        cls = jnp.argmax(logits + g, axis=-1)                   # [B]
    # mu-law decode of the OUTPUT sample (exp(x)-1: expm1 has no
    # Mosaic lowering; x in [0, log1p(mu)] so precision loss is nil). The
    # clip guards f32 rounding at the extreme classes (exp(log1p(mu)) can
    # land a hair above mu+1).
    f = 2.0 * cls.astype(F32) / mu - 1.0
    return f, jnp.clip(
        jnp.sign(f) * (jnp.exp(jnp.abs(f) * log1p_mu) - 1.0) / mu, -1.0, 1.0)


def _sample_mol(logits, key, num_mixtures: int, greedy: bool):
    """In-kernel mixture-of-logistics sampling (distribs.py semantics):
    Gumbel-argmax mixture select as a one-hot reduce, then the logistic
    inverse-CDF draw — all [B, M]-shaped VPU ops, no gathers."""
    from ...vocoder.models.distribs import LOG_SCALE_MIN

    M = num_mixtures
    lp = logits[:, :M]
    means = logits[:, M:2 * M]
    log_s = jnp.maximum(logits[:, 2 * M:3 * M], LOG_SCALE_MIN)
    if greedy:
        idx = jnp.argmax(lp, axis=-1)
    else:
        g = -jnp.log(-jnp.log(_uniform(lp.shape, key, 1)))
        idx = jnp.argmax(lp + g, axis=-1)
    onehot = (lax.broadcasted_iota(jnp.int32, lp.shape, 1)
              == idx[:, None]).astype(F32)
    mu = jnp.sum(onehot * means, axis=-1)
    if greedy:
        return jnp.clip(mu, -1.0, 1.0)
    ls = jnp.sum(onehot * log_s, axis=-1)
    u = jnp.sum(onehot * _uniform(lp.shape, key, 2), axis=-1)
    u = jnp.clip(u, 1e-5, 1.0 - 1e-5)
    x = mu + jnp.exp(ls) * (jnp.log(u) - jnp.log1p(-u))
    return jnp.clip(x, -1.0, 1.0)


def _sample_gauss(logits, key, greedy: bool):
    from ...vocoder.models.distribs import LOG_SCALE_MIN

    mu = logits[:, 0]
    if greedy:
        return jnp.clip(mu, -1.0, 1.0)
    log_s = jnp.maximum(logits[:, 1], LOG_SCALE_MIN)
    # Box-Muller from two independent uniform planes
    u1 = _uniform(mu.shape + (1,), key, 3)[:, 0]
    u2 = _uniform(mu.shape + (1,), key, 4)[:, 0]
    z = jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(2.0 * np.pi * u2)
    return jnp.clip(mu + jnp.exp(log_s) * z, -1.0, 1.0)


def _kernel(seed_ref, cond_ref,
            i_w_x, i_w_c, i_b, g1_wx, g1_wh, g1_bx, g1_bh,
            g2_wx_x, g2_wx_a, g2_wh, g2_bx, g2_bh,
            fc1_w_x, fc1_w_a, fc1_b, fc2_w_f, fc2_w_a, fc2_b, fc3_w, fc3_b,
            out_ref, h1_ref, h2_ref, x_ref, *, chunk: int, n_mels: int,
            aux_dims: int, bits: int, mode: str = "mulaw",
            num_mixtures: int = 10, greedy: bool = False):
    step0 = pl.program_id(0) == 0

    @pl.when(step0)
    def _():
        h1_ref[...] = jnp.zeros_like(h1_ref)
        h2_ref[...] = jnp.zeros_like(h2_ref)
        x_ref[...] = jnp.zeros_like(x_ref)

    seed = seed_ref[0]
    chunk_base = pl.program_id(0) * np.int32(chunk)

    def body(t, _):
        # per-sample PRNG key: unique per (seed, global sample index),
        # independent of chunking
        key = _fmix32(seed + (chunk_base + t) * np.int32(_GOLD))
        c_t = cond_ref[t]                      # [B, C] = [B, 1+n_mels+4*aux]
        a2 = c_t[:, n_mels + aux_dims: n_mels + 2 * aux_dims]
        a3 = c_t[:, n_mels + 2 * aux_dims: n_mels + 3 * aux_dims]
        a4 = c_t[:, n_mels + 3 * aux_dims: n_mels + 4 * aux_dims]
        x_prev = x_ref[...]                    # [B, 1]
        h1 = h1_ref[...]
        h2 = h2_ref[...]

        # every input concat is gone from the serial chain (a concat is a
        # VMEM copy — taco2_decode._lstm measurement): weights are row-split
        # at trace time and the parts matmul the already-extracted slices.
        # x_prev's "matmul" is an outer product with one weight row — a VPU
        # broadcast multiply, no MXU pass at all.
        x = (x_prev * i_w_x[...]
             + jnp.dot(c_t[:, : n_mels + aux_dims], i_w_c[...],
                       preferred_element_type=F32) + i_b[...])

        g1_part = jnp.dot(x, g1_wx[...], preferred_element_type=F32) + g1_bx[...]
        h1 = _gru(g1_part, h1, g1_wh[...], g1_bh[...])
        x = x + h1

        g2_part = (jnp.dot(x, g2_wx_x[...], preferred_element_type=F32)
                   + jnp.dot(a2, g2_wx_a[...], preferred_element_type=F32)
                   + g2_bx[...])
        h2 = _gru(g2_part, h2, g2_wh[...], g2_bh[...])
        x = x + h2

        f1 = jax.nn.relu(
            jnp.dot(x, fc1_w_x[...], preferred_element_type=F32)
            + jnp.dot(a3, fc1_w_a[...], preferred_element_type=F32)
            + fc1_b[...])
        f2 = jax.nn.relu(
            jnp.dot(f1, fc2_w_f[...], preferred_element_type=F32)
            + jnp.dot(a4, fc2_w_a[...], preferred_element_type=F32)
            + fc2_b[...])
        logits = jnp.dot(f2, fc3_w[...], preferred_element_type=F32) + fc3_b[...]

        if mode == "mulaw":
            x_next, sample = _sample_mulaw(logits, key, bits, greedy)
        elif mode == "mol":
            x_next = sample = _sample_mol(logits, key, num_mixtures, greedy)
        else:
            x_next = sample = _sample_gauss(logits, key, greedy)

        h1_ref[...] = h1
        h2_ref[...] = h2
        x_ref[...] = x_next[:, None]
        out_ref[t] = sample
        return 0

    lax.fori_loop(0, chunk, body, 0)


def default_chunk(batch: int, channels: int, budget_bytes: int = 2 << 20) -> int:
    """Chunk length such that the double-buffered conditioning block stays
    within ~2 MB of VMEM (weights need the rest; 16 MB/core total)."""
    per_step = batch * channels * 4
    chunk = max(64, budget_bytes // max(per_step, 1))
    return min(1024, (chunk // 64) * 64)


def wavernn_generate_pallas(params: dict, cond: jnp.ndarray, aux: jnp.ndarray,
                            seed, *, bits: int, chunk: int | None = None,
                            interpret: bool = False, mode: str = "mulaw",
                            num_mixtures: int = 10,
                            greedy: bool = False) -> jnp.ndarray:
    """Decode folds with the weights-resident Pallas kernel.

    params: the WaveRNN param pytree (models/wavernn.py layout).
    cond: [B, L, n_mels] upsampled conditioning; aux: [B, L, 4*aux_dims].
    mode: 'mulaw' (categorical), 'mol', or 'gauss' — sampling runs in-kernel
    for all three. Returns samples [B, L]; L is padded up to a chunk multiple
    internally.
    """
    B, L, n_mels = cond.shape
    aux_dims = aux.shape[-1] // 4
    if chunk is None:
        chunk = default_chunk(B, n_mels + aux.shape[-1])
    Lp = ((L + chunk - 1) // chunk) * chunk
    stream = jnp.concatenate([cond, aux], axis=-1).astype(F32)
    stream = jnp.pad(stream, ((0, 0), (0, Lp - L), (0, 0)))
    stream = jnp.swapaxes(stream, 0, 1)                     # [Lp, B, C]
    n_chunks = Lp // chunk

    # row-split every [a|b]-input weight at trace time so the kernel never
    # concatenates on its serial chain (taco2_decode._lstm measurement):
    # I [x | mel,a1], rnn2 wx [x | a2], fc1 [x | a3], fc2 [f1 | a4]
    i_w = jnp.asarray(params["I"]["w"], F32)
    g2_wx = jnp.asarray(params["rnn2"]["wx"], F32)
    fc1_w = jnp.asarray(params["fc1"]["w"], F32)
    fc2_w = jnp.asarray(params["fc2"]["w"], F32)
    R = params["rnn1"]["wx"].shape[0]
    Fd = fc1_w.shape[1]
    w = [
        i_w[0:1], i_w[1:], params["I"]["b"],
        params["rnn1"]["wx"], params["rnn1"]["wh"],
        params["rnn1"]["bx"], params["rnn1"]["bh"],
        g2_wx[:R], g2_wx[R:], params["rnn2"]["wh"],
        params["rnn2"]["bx"], params["rnn2"]["bh"],
        fc1_w[:R], fc1_w[R:], params["fc1"]["b"],
        fc2_w[:Fd], fc2_w[Fd:], params["fc2"]["b"],
        params["fc3"]["w"], params["fc3"]["b"],
    ]
    w = [jnp.asarray(x, F32) for x in w]
    rnn_dims = R
    n_classes = w[18].shape[1]
    if n_classes % 128:
        # lane-pad the narrow MoL/Gauss head; pad logits take a huge negative
        # bias so a full-width argmax (mulaw path) could never pick them, and
        # the mode samplers slice the real columns anyway
        padn = 128 - n_classes % 128
        w[18] = jnp.pad(w[18], ((0, 0), (0, padn)))
        w[19] = jnp.pad(w[19], ((0, padn),), constant_values=-1e9)

    # The input sample channel slot: cond stream layout is [mel | a1..a4];
    # x_prev is carried in scratch, so C here excludes it.
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_chunks,),
        in_specs=[pl.BlockSpec((chunk, B, stream.shape[-1]),
                               lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM)] +
                 [pl.BlockSpec(x.shape, (lambda i, *_, n=x.ndim: (0,) * n),
                               memory_space=pltpu.VMEM) for x in w],
        out_specs=pl.BlockSpec((chunk, B), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((B, rnn_dims), F32),   # h1
            pltpu.VMEM((B, rnn_dims), F32),   # h2
            pltpu.VMEM((B, 1), F32),          # x_prev
        ],
    )
    kernel = functools.partial(_kernel, chunk=chunk, n_mels=n_mels,
                               aux_dims=aux_dims, bits=bits, mode=mode,
                               num_mixtures=num_mixtures, greedy=greedy)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Lp, B), F32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(jnp.asarray([seed], jnp.int32), stream, *w)
    return jnp.swapaxes(out, 0, 1)[:, :L]
