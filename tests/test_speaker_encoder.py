"""Speaker-encoder tests: d-vector properties, GE2E behavior, training step,
embedding extraction -> cloning-path wiring."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from your_voice_tts_tpu.speaker_encoder.losses import (
    ge2e_loss, ge2e_similarity, init_ge2e_params,
)
from your_voice_tts_tpu.speaker_encoder.model import SpeakerEncoder

KEY = jax.random.PRNGKey(0)


@pytest.fixture(scope="module")
def small_model():
    return SpeakerEncoder(input_dim=20, proj_dim=16, lstm_dim=32, num_layers=2)


def test_embedding_normalized(small_model):
    p = small_model.init(KEY)
    mels = jax.random.normal(KEY, (3, 40, 20))
    emb = small_model(p, mels)
    assert emb.shape == (3, 16)
    np.testing.assert_allclose(np.asarray(jnp.linalg.norm(emb, axis=-1)), 1.0,
                               atol=1e-5)


def test_compute_embedding_windows(small_model):
    p = small_model.init(KEY)
    short = jax.random.normal(KEY, (20, 20))
    long = jax.random.normal(KEY, (300, 20))
    e1 = small_model.compute_embedding(p, short, num_frames=50)
    e2 = small_model.compute_embedding(p, long, num_frames=50)
    for e in (e1, e2):
        assert e.shape == (16,)
        np.testing.assert_allclose(float(jnp.linalg.norm(e)), 1.0, atol=1e-5)


def test_ge2e_similarity_shape_and_loo():
    N, M, D = 3, 4, 8
    emb = jax.random.normal(KEY, (N, M, D))
    sim = ge2e_similarity(emb, jnp.asarray(1.0), jnp.asarray(0.0))
    assert sim.shape == (N, M, N)
    assert np.all(np.asarray(sim) <= 1.0 + 1e-5)


def test_ge2e_loss_separated_lower_than_mixed():
    """Well-separated speaker clusters must score lower GE2E loss."""
    D = 8
    base = jax.random.normal(KEY, (3, 1, D))
    tight = base + 0.01 * jax.random.normal(KEY, (3, 4, D))
    mixed = jax.random.normal(jax.random.PRNGKey(1), (3, 4, D))
    lp = init_ge2e_params()
    l_tight = float(ge2e_loss(tight, lp["w"], lp["b"]))
    l_mixed = float(ge2e_loss(mixed, lp["w"], lp["b"]))
    assert l_tight < l_mixed


def test_ge2e_training_separates(tmp_path):
    """A few GE2E steps on synthetic 2-speaker data must reduce loss and the
    trainer must checkpoint/restore."""
    from your_voice_tts_tpu.audio import AudioProcessor
    from your_voice_tts_tpu.config import AudioConfig
    from your_voice_tts_tpu.data.formatters import synthetic
    from your_voice_tts_tpu.data.synthetic import make_synthetic_corpus
    from your_voice_tts_tpu.speaker_encoder.dataset import SpeakerEncoderDataset
    from your_voice_tts_tpu.speaker_encoder.train import SpeakerEncoderTrainer

    corpus = str(tmp_path / "c")
    make_synthetic_corpus(corpus, n_items=8, sr=8000, n_speakers=2)
    ap = AudioProcessor(AudioConfig(sample_rate=8000, fft_size=256, hop_length=64,
                                    win_length=256, num_mels=20, mel_fmax=None,
                                    do_trim_silence=False))
    ds = SpeakerEncoderDataset(synthetic(corpus), ap, num_frames=40)
    model = SpeakerEncoder(input_dim=20, proj_dim=16, lstm_dim=32, num_layers=2)
    trainer = SpeakerEncoderTrainer(model, ds, lr=1e-3,
                                    num_speakers_per_batch=2,
                                    num_utters_per_speaker=3, verbose=False)
    l0 = trainer.fit(1)["loss"]
    l1 = trainer.fit(8)["loss"]
    assert np.isfinite(l0) and l1 < l0
    ck = str(tmp_path / "se.npz")
    trainer.save(ck)
    trainer.restore(ck)
    assert int(trainer.state.step) == 9


def test_compute_embeddings_cli_and_cloning(tmp_path):
    """Full cloning data path: corpus -> compute_embeddings CLI ->
    speakers.json -> d-vector conditioned synthesis (SURVEY.md SS3.5)."""
    import json

    from your_voice_tts_tpu.bin.compute_embeddings import main as embed_main
    from your_voice_tts_tpu.data.synthetic import make_synthetic_corpus
    from your_voice_tts_tpu.utils.speakers import load_speaker_mapping, parse_speakers

    corpus = str(tmp_path / "c2")
    make_synthetic_corpus(corpus, n_items=6, sr=8000, n_speakers=2)
    # tts config for audio params
    cfgp = str(tmp_path / "cfg.json")
    json.dump({"audio": {"sample_rate": 8000, "fft_size": 256, "hop_length": 64,
                         "win_length": 256, "num_mels": 20, "mel_fmax": None,
                         "do_trim_silence": False}}, open(cfgp, "w"))
    out = str(tmp_path / "speakers.json")
    embed_main(["--config", cfgp, "--data_path", corpus, "--formatter",
                "synthetic", "--output", out, "--num_frames", "40"])
    ids, embs = parse_speakers(load_speaker_mapping(out))
    assert len(ids) == 2
    dim = len(next(iter(embs.values())))
    assert dim == 256  # default SpeakerEncoder proj_dim

    # d-vector conditioned synthesis with a small multispeaker Tacotron2
    from your_voice_tts_tpu.config import ModelConfig
    from your_voice_tts_tpu.models.tacotron2 import Tacotron2

    mcfg = ModelConfig(r=2, embedding_dim=32, encoder_dim=32, decoder_rnn_dim=48,
                       attention_rnn_dim=48, attention_dim=24,
                       attention_location_filters=8,
                       attention_location_kernel_size=15, prenet_dim=24,
                       postnet_dim=32, max_decoder_steps=8)
    model = Tacotron2(30, mcfg, n_mels=20, num_speakers=2,
                      speaker_embedding_dim=dim)
    variables = model.init(KEY)
    text = jnp.asarray([[1, 2, 3, 4, 5, 6, 7, 8]])
    d_a = jnp.asarray(np.stack([list(embs.values())[0]]))
    d_b = jnp.asarray(np.stack([list(embs.values())[1]]))
    out_a = model.inference(variables, text, jnp.array([8]), speaker_embeddings=d_a)
    out_b = model.inference(variables, text, jnp.array([8]), speaker_embeddings=d_b)
    assert not np.allclose(np.asarray(out_a["postnet_outputs"]),
                           np.asarray(out_b["postnet_outputs"]))
