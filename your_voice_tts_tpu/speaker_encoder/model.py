"""d-vector network (reference speaker_encoder/model.py): a stack of
LSTM-with-projection layers over mel frames; the embedding is the L2-
normalized projection output at the final frame."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ..nn.core import Params


class LSTMWithProjection:
    """LSTM(hidden) with output projection. Gate order (i, f, g, o).

    recur_on_proj=True (default, true LSTMP — Sak et al. 2014): the projected
    output is both the layer output and the next step's recurrent input;
    smaller recurrent matmul, the TPU-friendly choice this framework trains
    with. recur_on_proj=False reproduces the reference LSTMWithProjection
    (a plain nn.LSTM recurring on its own hidden, Linear projection applied
    to the output sequence afterwards) — the layout trained reference
    speaker-encoder checkpoints expect (utils/torch_import.py)."""

    def __init__(self, in_dim: int, hidden: int, proj: int,
                 recur_on_proj: bool = True):
        self.in_dim, self.hidden, self.proj_dim = in_dim, hidden, proj
        self.recur_on_proj = recur_on_proj

    def init(self, key) -> Params:
        import math

        k1, k2, k3, k4 = jax.random.split(key, 4)
        s = 1.0 / math.sqrt(self.hidden)
        u = lambda k, shape: jax.random.uniform(k, shape, jnp.float32, -s, s)
        rec_dim = self.proj_dim if self.recur_on_proj else self.hidden
        return {
            "wx": u(k1, (self.in_dim, 4 * self.hidden)),
            "wh": u(k2, (rec_dim, 4 * self.hidden)),
            "b": u(k3, (4 * self.hidden,)),
            "proj": u(k4, (self.hidden, self.proj_dim)),
        }

    def __call__(self, p: Params, xs):
        """[B, T, in] -> [B, T, proj]."""
        B = xs.shape[0]
        rec_dim = self.proj_dim if self.recur_on_proj else self.hidden
        h0 = (jnp.zeros((B, rec_dim)), jnp.zeros((B, self.hidden)))

        def step(state, x_t):
            h_rec, c = state
            gates = x_t @ p["wx"] + h_rec @ p["wh"] + p["b"]
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
            h = jax.nn.sigmoid(o) * jnp.tanh(c)
            out = h @ p["proj"]
            return ((out, c) if self.recur_on_proj else (h, c)), out

        _, ys = lax.scan(step, h0, jnp.swapaxes(xs, 0, 1))
        return jnp.swapaxes(ys, 0, 1)


class SpeakerEncoder:
    """3x LSTMP(768 -> 256) -> L2-normalized 256-d d-vector (reference dims)."""

    def __init__(self, input_dim: int = 80, proj_dim: int = 256,
                 lstm_dim: int = 768, num_layers: int = 3,
                 recur_on_proj: bool = True):
        self.layers = []
        in_dim = input_dim
        for _ in range(num_layers):
            self.layers.append(LSTMWithProjection(in_dim, lstm_dim, proj_dim,
                                                  recur_on_proj))
            in_dim = proj_dim
        self.proj_dim = proj_dim

    def init(self, key) -> Params:
        ks = jax.random.split(key, len(self.layers))
        return {"layers": [l.init(k) for l, k in zip(self.layers, ks)]}

    def __call__(self, p: Params, mels):
        """mels [B, T, n_mels] -> embeddings [B, proj_dim], L2-normalized."""
        x = mels
        for layer, lp in zip(self.layers, p["layers"]):
            x = layer(lp, x)
        emb = x[:, -1, :]
        return emb / jnp.maximum(jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-8)

    def compute_embedding(self, p: Params, mel, num_frames: int = 160,
                          overlap: float = 0.5):
        """Sliding-window embedding of one utterance [T, n_mels] (reference
        compute_embedding): average of window embeddings, re-normalized."""
        T = mel.shape[0]
        if T <= num_frames:
            reps = -(-num_frames // T)
            mel = jnp.tile(mel, (reps, 1))[:num_frames]
            return self(p, mel[None])[0]
        hop = max(1, int(num_frames * (1 - overlap)))
        starts = list(range(0, T - num_frames + 1, hop)) or [0]
        wins = jnp.stack([mel[s: s + num_frames] for s in starts])
        embs = self(p, wins)
        mean = embs.mean(axis=0)
        return mean / jnp.maximum(jnp.linalg.norm(mean), 1e-8)


def arch_from_checkpoint(path: str) -> dict:
    """Infer SpeakerEncoder constructor kwargs from a checkpoint's param
    shapes — fallback for checkpoints whose meta lacks the architecture
    record (only imported reference encoders carry one). wx[0] gives
    (input_dim, 4*lstm_dim), proj gives proj_dim, and wh's leading dim
    distinguishes recur_on_proj (== proj_dim) from the reference recurrence
    (== lstm_dim); the ambiguous proj_dim == lstm_dim case defaults True."""
    import re

    import numpy as np

    with np.load(path) as z:
        shapes = {k[len("params::"):]: z[k].shape for k in z.files
                  if k.startswith("params::['layers']")}
    layers = {int(re.match(r"\['layers'\]\[(\d+)\]", k).group(1))
              for k in shapes}
    wx = shapes["['layers'][0]['wx']"]
    proj = shapes["['layers'][0]['proj']"]
    wh = shapes["['layers'][0]['wh']"]
    lstm_dim = wx[1] // 4
    proj_dim = proj[1]
    return {"input_dim": wx[0], "proj_dim": proj_dim, "lstm_dim": lstm_dim,
            "num_layers": len(layers),
            "recur_on_proj": (wh[0] == proj_dim if proj_dim != lstm_dim
                              else True)}


def load_encoder(checkpoint: str, default_input_dim: int = 80):
    """Build a SpeakerEncoder matching a checkpoint and load it.

    Architecture resolution: checkpoint meta record (imported reference
    encoders) -> shape inference (self-trained) -> constructor defaults
    with `default_input_dim`. Returns (encoder, params). Shared by
    bin/compute_embeddings and bin/export_serving so the two CLIs cannot
    drift."""
    import jax

    from ..train.checkpoint import load_checkpoint, read_meta

    enc_kw = read_meta(checkpoint).get("speaker_encoder") or \
        arch_from_checkpoint(checkpoint)
    enc = SpeakerEncoder(
        input_dim=enc_kw.get("input_dim", default_input_dim),
        proj_dim=enc_kw.get("proj_dim", 256),
        lstm_dim=enc_kw.get("lstm_dim", 768),
        num_layers=enc_kw.get("num_layers", 3),
        recur_on_proj=enc_kw.get("recur_on_proj", True))
    params = enc.init(jax.random.PRNGKey(0))
    params, _, _, _ = load_checkpoint(checkpoint, params=params,
                                      model_state={}, opt_state=None)
    return enc, params
