"""GE2E loss (Wan et al. 2018; reference speaker_encoder/losses.py).

Embeddings come grouped [N_speakers, M_utterances, D]. The similarity of
utterance (j, i) to centroid k uses the leave-one-out centroid when k == j.
Softmax contrast variant (the reference default)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ge2e_similarity(embeddings: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray
                    ) -> jnp.ndarray:
    """[N, M, D] -> cosine similarity matrix [N, M, N] with learnable scale."""
    N, M, D = embeddings.shape
    centroids = embeddings.mean(axis=1)                              # [N, D]
    # leave-one-out centroids for own speaker: (sum - e_ji) / (M - 1)
    sums = embeddings.sum(axis=1, keepdims=True)                     # [N, 1, D]
    loo = (sums - embeddings) / jnp.maximum(M - 1, 1)                # [N, M, D]

    def norm(x):
        return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-8)

    e = norm(embeddings)
    c = norm(centroids)
    loo = norm(loo)
    sim = jnp.einsum("nmd,kd->nmk", e, c)                            # vs all centroids
    own = jnp.einsum("nmd,nmd->nm", e, loo)                          # vs own LOO centroid
    eye = jnp.eye(N)[:, None, :]                                     # [N, 1, N]
    sim = sim * (1 - eye) + own[..., None] * eye
    return w * sim + b


def ge2e_loss(embeddings: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray
              ) -> jnp.ndarray:
    """Softmax GE2E: -log softmax over centroids of the own-speaker entry."""
    N, M, _ = embeddings.shape
    sim = ge2e_similarity(embeddings, w, b)                          # [N, M, N]
    logp = jax.nn.log_softmax(sim, axis=-1)
    own = jnp.take_along_axis(
        logp, jnp.arange(N)[:, None, None].repeat(M, axis=1), axis=-1)
    return -own.mean()


def init_ge2e_params():
    """Learnable (w, b) initialized to (10, -5) as in the paper/reference."""
    return {"w": jnp.asarray(10.0), "b": jnp.asarray(-5.0)}
