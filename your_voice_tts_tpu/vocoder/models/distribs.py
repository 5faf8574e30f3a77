"""Output distributions for WaveRNN: discretized mixture of logistics and
single Gaussian (reference vocoder/models/wavernn.py mode in
{RAW/mu-law categorical, MOLD, GAUSS}; SURVEY.md:110 "I/O 10-bit mu-law or
mixture-of-logistics").

All functions are pure jnp and shape-polymorphic over leading axes:
parameters ``y_hat [..., K]`` against targets ``y [...]`` in [-1, 1].

TPU notes: everything here is elementwise/VPU work fused by XLA into the
surrounding scan or Pallas kernel; the MoL mixture select uses one-hot
contractions instead of gathers (gathers over the lane axis don't map to
the VPU; a [B, M] one-hot reduce does).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# ln(1e-7): reference clamps log-scales to keep exp(-log_s) finite in f32
LOG_SCALE_MIN = float(np.log(1e-7))


def mol_param_count(num_mixtures: int = 10) -> int:
    return 3 * num_mixtures


def _split_mol(y_hat: jnp.ndarray):
    M = y_hat.shape[-1] // 3
    logit_probs = y_hat[..., :M]
    means = y_hat[..., M:2 * M]
    log_scales = jnp.maximum(y_hat[..., 2 * M:3 * M], LOG_SCALE_MIN)
    return logit_probs, means, log_scales


def discretized_mix_logistic_loss(y_hat: jnp.ndarray, y: jnp.ndarray,
                                  num_classes: int = 65536,
                                  reduce: bool = True) -> jnp.ndarray:
    """Negative log-likelihood of y in [-1,1] under a discretized mixture of
    logistics (PixelCNN++ formulation, 16-bit bins like the reference).

    y_hat: [..., 3M] (mixture logits | means | log-scales); y: [...].
    """
    logit_probs, means, log_scales = _split_mol(y_hat)
    yb = y[..., None]
    centered = yb - means
    inv_stdv = jnp.exp(-log_scales)
    half_bin = 1.0 / (num_classes - 1)
    plus_in = inv_stdv * (centered + half_bin)
    min_in = inv_stdv * (centered - half_bin)
    cdf_plus = jax.nn.sigmoid(plus_in)
    cdf_min = jax.nn.sigmoid(min_in)
    # edge bins integrate the full tail
    log_cdf_plus = plus_in - jax.nn.softplus(plus_in)        # log sigmoid
    log_one_minus_cdf_min = -jax.nn.softplus(min_in)
    cdf_delta = cdf_plus - cdf_min
    mid_in = inv_stdv * centered
    # log-pdf at bin center, for bins too narrow for the cdf difference
    log_pdf_mid = mid_in - log_scales - 2.0 * jax.nn.softplus(mid_in)

    inner = jnp.where(
        cdf_delta > 1e-5,
        jnp.log(jnp.maximum(cdf_delta, 1e-12)),
        log_pdf_mid - np.log((num_classes - 1) / 2.0))
    log_probs = jnp.where(
        yb < -0.999, log_cdf_plus,
        jnp.where(yb > 0.999, log_one_minus_cdf_min, inner))
    log_probs = log_probs + jax.nn.log_softmax(logit_probs, axis=-1)
    nll = -jax.nn.logsumexp(log_probs, axis=-1)
    return nll.mean() if reduce else nll


def sample_from_discretized_mix_logistic(y_hat: jnp.ndarray, key: jax.Array,
                                         greedy: bool = False) -> jnp.ndarray:
    """Draw a sample in [-1,1] per row of y_hat [..., 3M].

    greedy=True: most-probable mixture's mean, no noise (used by the
    kernel-equivalence tests, mirroring the categorical argmax path)."""
    logit_probs, means, log_scales = _split_mol(y_hat)
    M = logit_probs.shape[-1]
    if greedy:
        sel = jax.nn.one_hot(jnp.argmax(logit_probs, axis=-1), M)
        return jnp.clip(jnp.sum(sel * means, axis=-1), -1.0, 1.0)
    k1, k2 = jax.random.split(key)
    g = -jnp.log(-jnp.log(
        jax.random.uniform(k1, logit_probs.shape, minval=1e-5, maxval=1.0 - 1e-5)))
    sel = jax.nn.one_hot(jnp.argmax(logit_probs + g, axis=-1), M)
    mu = jnp.sum(sel * means, axis=-1)
    log_s = jnp.sum(sel * log_scales, axis=-1)
    u = jax.random.uniform(k2, mu.shape, minval=1e-5, maxval=1.0 - 1e-5)
    x = mu + jnp.exp(log_s) * (jnp.log(u) - jnp.log1p(-u))
    return jnp.clip(x, -1.0, 1.0)


def gaussian_loss(y_hat: jnp.ndarray, y: jnp.ndarray,
                  reduce: bool = True) -> jnp.ndarray:
    """NLL of y under N(mu, sigma^2) with y_hat [..., 2] = (mu, log_sigma)."""
    mu = y_hat[..., 0]
    log_s = jnp.maximum(y_hat[..., 1], LOG_SCALE_MIN)
    nll = 0.5 * np.log(2.0 * np.pi) + log_s \
        + 0.5 * jnp.exp(-2.0 * log_s) * (y - mu) ** 2
    return nll.mean() if reduce else nll


def sample_from_gaussian(y_hat: jnp.ndarray, key: jax.Array,
                         greedy: bool = False) -> jnp.ndarray:
    mu = y_hat[..., 0]
    if greedy:
        return jnp.clip(mu, -1.0, 1.0)
    log_s = jnp.maximum(y_hat[..., 1], LOG_SCALE_MIN)
    eps = jax.random.normal(key, mu.shape)
    return jnp.clip(mu + jnp.exp(log_s) * eps, -1.0, 1.0)
