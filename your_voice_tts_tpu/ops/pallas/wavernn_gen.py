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
- sampling runs in-kernel: per-step PRNG bits -> Gumbel-argmax over the
  mu-law categorical, decoded to the next float sample.

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


def _kernel(seed_ref, cond_ref,
            i_w, i_b, g1_wx, g1_wh, g1_bx, g1_bh, g2_wx, g2_wh, g2_bx, g2_bh,
            fc1_w, fc1_b, fc2_w, fc2_b, fc3_w, fc3_b,
            out_ref, h1_ref, h2_ref, x_ref, *, chunk: int, n_mels: int,
            aux_dims: int, bits: int, greedy: bool = False):
    step0 = pl.program_id(0) == 0

    @pl.when(step0)
    def _():
        h1_ref[...] = jnp.zeros_like(h1_ref)
        h2_ref[...] = jnp.zeros_like(h2_ref)
        x_ref[...] = jnp.zeros_like(x_ref)

    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    mu = float(2 ** bits - 1)
    log1p_mu = float(np.log1p(mu))

    def body(t, _):
        c_t = cond_ref[t]                      # [B, C] = [B, 1+n_mels+4*aux]
        m_t = c_t[:, :n_mels]
        a1 = c_t[:, n_mels: n_mels + aux_dims]
        a2 = c_t[:, n_mels + aux_dims: n_mels + 2 * aux_dims]
        a3 = c_t[:, n_mels + 2 * aux_dims: n_mels + 3 * aux_dims]
        a4 = c_t[:, n_mels + 3 * aux_dims: n_mels + 4 * aux_dims]
        x_prev = x_ref[...]                    # [B, 1]
        h1 = h1_ref[...]
        h2 = h2_ref[...]

        xin = jnp.concatenate([x_prev, m_t, a1], axis=-1)
        x = jnp.dot(xin, i_w[...], preferred_element_type=F32) + i_b[...]

        g1_part = jnp.dot(x, g1_wx[...], preferred_element_type=F32) + g1_bx[...]
        h1 = _gru(g1_part, h1, g1_wh[...], g1_bh[...])
        x = x + h1

        x2in = jnp.concatenate([x, a2], axis=-1)
        g2_part = jnp.dot(x2in, g2_wx[...], preferred_element_type=F32) + g2_bx[...]
        h2 = _gru(g2_part, h2, g2_wh[...], g2_bh[...])
        x = x + h2

        f1 = jax.nn.relu(jnp.dot(jnp.concatenate([x, a3], axis=-1), fc1_w[...],
                                 preferred_element_type=F32) + fc1_b[...])
        f2 = jax.nn.relu(jnp.dot(jnp.concatenate([f1, a4], axis=-1), fc2_w[...],
                                 preferred_element_type=F32) + fc2_b[...])
        logits = jnp.dot(f2, fc3_w[...], preferred_element_type=F32) + fc3_b[...]

        if greedy:
            cls = jnp.argmax(logits, axis=-1)  # deterministic (testing)
        else:
            # Gumbel-argmax categorical sample
            bits_u32 = pltpu.prng_random_bits(logits.shape)
            u = (bits_u32.astype(F32) + 0.5) * (1.0 / 4294967296.0) + 1e-12
            g = -jnp.log(-jnp.log(u))
            cls = jnp.argmax(logits + g, axis=-1)  # [B]

        # mu-law decode to the next float sample (exp(x)-1: expm1 has no
        # Mosaic lowering; x in [0, log1p(mu)] so precision loss is nil)
        f = 2.0 * cls.astype(F32) / mu - 1.0
        sample = jnp.sign(f) * (jnp.exp(jnp.abs(f) * log1p_mu) - 1.0) / mu

        h1_ref[...] = h1
        h2_ref[...] = h2
        x_ref[...] = sample[:, None]
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
                            interpret: bool = False,
                            greedy: bool = False) -> jnp.ndarray:
    """Decode folds with the weights-resident Pallas kernel.

    params: the WaveRNN param pytree (models/wavernn.py layout).
    cond: [B, L, n_mels] upsampled conditioning; aux: [B, L, 4*aux_dims].
    Returns samples [B, L]. L is padded up to a chunk multiple internally.
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

    w = [
        params["I"]["w"], params["I"]["b"],
        params["rnn1"]["wx"], params["rnn1"]["wh"],
        params["rnn1"]["bx"], params["rnn1"]["bh"],
        params["rnn2"]["wx"], params["rnn2"]["wh"],
        params["rnn2"]["bx"], params["rnn2"]["bh"],
        params["fc1"]["w"], params["fc1"]["b"],
        params["fc2"]["w"], params["fc2"]["b"],
        params["fc3"]["w"], params["fc3"]["b"],
    ]
    w = [jnp.asarray(x, F32) for x in w]
    rnn_dims = w[2].shape[0]
    n_classes = w[14].shape[1]

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
                               aux_dims=aux_dims, bits=bits, greedy=greedy)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Lp, B), F32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(jnp.asarray([seed], jnp.int32), stream, *w)
    return jnp.swapaxes(out, 0, 1)[:, :L]
