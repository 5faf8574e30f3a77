"""AOT serving-export gates (infer/export.py): the serialized StableHLO
artifact must reproduce the live jitted program and be servable through
ExportedSynthesizer with shape-bucket padding."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from your_voice_tts_tpu.audio import AudioProcessor
from your_voice_tts_tpu.config import AudioConfig, ModelConfig
from your_voice_tts_tpu.infer.export import (ExportedSynthesizer,
                                             export_serving, make_serving_fn)
from your_voice_tts_tpu.models.tacotron2 import Tacotron2

N_MELS, N_CHARS = 20, 30


@pytest.fixture(scope="module")
def tiny():
    cfgm = ModelConfig(r=2, embedding_dim=32, encoder_dim=32,
                       decoder_rnn_dim=48, attention_rnn_dim=48,
                       attention_dim=24, attention_location_filters=8,
                       attention_location_kernel_size=15, prenet_dim=24,
                       postnet_dim=32, max_decoder_steps=10,
                       prenet_dropout=False)
    acfg = AudioConfig(num_mels=N_MELS, fft_size=256, sample_rate=8000,
                       hop_length=64, win_length=256, griffin_lim_iters=4,
                       mel_fmax=None)

    class Cfg:
        model = cfgm
        audio = acfg

    model = Tacotron2(N_CHARS, cfgm, n_mels=N_MELS)
    variables = model.init(jax.random.PRNGKey(0))
    ap = AudioProcessor(acfg)
    return model, variables, Cfg(), ap


def test_export_roundtrip_matches_live(tiny, tmp_path):
    model, variables, cfg, ap = tiny
    out = str(tmp_path / "exported")
    manifest = export_serving(model, variables, cfg, ap, out,
                              batch_sizes=(2,), text_buckets=(16,),
                              platforms=("cpu",))
    assert manifest["entries"] == [
        {"file": "serve_b2_t16.stablehlo", "batch": 2, "text_bucket": 16}]

    rng = np.random.default_rng(0)
    text = rng.integers(1, N_CHARS, (2, 16)).astype(np.int32)
    lens = np.array([16, 12], np.int32)
    key = jax.random.PRNGKey(0)

    live = make_serving_fn(model, variables, cfg, ap)
    wav_live, len_live = jax.jit(live)(jnp.asarray(text), jnp.asarray(lens),
                                       key)

    served = ExportedSynthesizer(out)
    wav_exp, len_exp = served(text, lens, seed=0)
    assert wav_exp.shape == wav_live.shape
    np.testing.assert_array_equal(np.asarray(len_live), len_exp)
    np.testing.assert_allclose(np.asarray(wav_live), wav_exp, atol=1e-5)
    assert np.isfinite(wav_exp).all() and np.abs(wav_exp).max() > 0


def test_export_multiplatform_cpu_tpu(tiny, tmp_path):
    """The default platforms=("cpu","tpu") lowering works on a CPU-only
    host (lower once, run on either device kind) and the artifact still
    executes here on cpu."""
    model, variables, cfg, ap = tiny
    out = str(tmp_path / "exported_mp")
    manifest = export_serving(model, variables, cfg, ap, out,
                              batch_sizes=(1,), text_buckets=(16,),
                              platforms=("cpu", "tpu"))
    assert manifest["platforms"] == ["cpu", "tpu"]
    text = np.random.default_rng(5).integers(1, N_CHARS, (1, 16)) \
        .astype(np.int32)
    wav, _ = ExportedSynthesizer(out)(text, np.array([16], np.int32))
    assert wav.shape[0] == 1 and np.isfinite(wav).all()


def test_export_pallas_tpu_artifact_lowers(tiny, tmp_path):
    """use_pallas=True serializes the Mosaic decode + Griffin-Lim kernels
    into a TPU-only artifact from this CPU-only host (execution needs a
    TPU; this gates lowering, serialization, manifest, and the platform
    guard)."""
    model, variables, cfg, ap = tiny
    out = str(tmp_path / "exported_pallas")
    with pytest.raises(ValueError, match="TPU-only"):
        export_serving(model, variables, cfg, ap, out, platforms=("cpu",),
                       use_pallas=True)
    manifest = export_serving(model, variables, cfg, ap, out,
                              batch_sizes=(1,), text_buckets=(16,),
                              platforms=("tpu",), use_pallas=True)
    assert manifest["pallas"] is True and manifest["platforms"] == ["tpu"]
    served = ExportedSynthesizer(out)  # deserializes fine on any host
    assert served.shapes() == [(1, 16)]


def test_export_with_melgan_vocoder(tiny, tmp_path):
    """A MelGAN generator baked into the artifact replaces Griffin-Lim:
    output length is frames x upsample product and matches the live jitted
    TTS+vocoder program."""
    from your_voice_tts_tpu.config import AudioConfig as VAudio
    from your_voice_tts_tpu.vocoder.config import MelganConfig, VocoderConfig
    from your_voice_tts_tpu.vocoder.synthesizer import VocoderSynthesizer

    model, variables, cfg, ap = tiny
    vcfg = VocoderConfig(
        model="melgan",
        audio=VAudio(sample_rate=8000, fft_size=256, hop_length=64,
                     win_length=256, num_mels=N_MELS, mel_fmax=None,
                     do_trim_silence=False),
        melgan=MelganConfig(upsample_factors=(4, 4, 4), base_channels=8,
                            num_res_blocks=1, num_scales=1,
                            disc_base_channels=4))
    voc = VocoderSynthesizer(vcfg, None)
    out = str(tmp_path / "exported_voc")
    manifest = export_serving(model, variables, cfg, ap, out,
                              batch_sizes=(2,), text_buckets=(16,),
                              platforms=("cpu",), vocoder=voc)
    assert manifest["waveform"] == "melgan"
    assert manifest["samples_per_frame"] == 64

    rng = np.random.default_rng(2)
    text = rng.integers(1, N_CHARS, (2, 16)).astype(np.int32)
    lens = np.array([16, 10], np.int32)
    live = make_serving_fn(model, variables, cfg, ap, vocoder=voc)
    wav_live, _ = jax.jit(live)(jnp.asarray(text), jnp.asarray(lens),
                                jax.random.PRNGKey(0))
    served = ExportedSynthesizer(out)
    wav_exp, mel_lens = served(text, lens, seed=0)
    steps = cfg.model.max_decoder_steps * cfg.model.r
    assert wav_exp.shape == (2, steps * 64)
    np.testing.assert_allclose(np.asarray(wav_live), wav_exp, atol=1e-5)


def test_export_linear_tacotron1(tiny, tmp_path):
    """Tacotron1's linear head exports too: inversion goes through
    inv_spectrogram_batch (no mel pinv) and matches the live program."""
    from your_voice_tts_tpu.config import ModelConfig
    from your_voice_tts_tpu.models.tacotron import Tacotron

    _, _, cfg, ap = tiny
    n_freq = cfg.audio.fft_size // 2 + 1
    cfgm = ModelConfig(model="Tacotron", r=5, memory_size=4,
                       max_decoder_steps=4, attention_dim=24,
                       attention_location_filters=8,
                       attention_location_kernel_size=15, tacotron_width=32,
                       prenet_dropout=False)

    class Cfg:
        model = cfgm
        audio = cfg.audio

    model = Tacotron(N_CHARS, cfgm, n_mels=N_MELS, num_freq=n_freq)
    variables = model.init(jax.random.PRNGKey(0))
    out = str(tmp_path / "exported_lin")
    export_serving(model, variables, Cfg(), ap, out, batch_sizes=(2,),
                   text_buckets=(16,), platforms=("cpu",))
    text = np.random.default_rng(3).integers(1, N_CHARS, (2, 16)) \
        .astype(np.int32)
    lens = np.array([16, 11], np.int32)
    live = make_serving_fn(model, variables, Cfg(), ap)
    wav_live, _ = jax.jit(live)(jnp.asarray(text), jnp.asarray(lens),
                                jax.random.PRNGKey(0))
    wav_exp, _ = ExportedSynthesizer(out)(text, lens, seed=0)
    assert wav_exp.shape == wav_live.shape and np.isfinite(wav_exp).all()
    np.testing.assert_allclose(np.asarray(wav_live), wav_exp, atol=1e-5)


def test_export_dvector_speaker_input(tiny, tmp_path):
    """A cloning artifact: d-vector is a runtime input, the manifest carries
    a named speaker table, and different d-vectors give different audio."""
    from your_voice_tts_tpu.text import symbols

    _, _, cfg, ap = tiny
    # full symbol table so tts_to_wav_bytes' default frontend ids are in range
    model = Tacotron2(len(symbols), cfg.model, n_mels=N_MELS, num_speakers=4,
                      speaker_embedding_dim=8)
    variables = model.init(jax.random.PRNGKey(1))
    rng = np.random.default_rng(4)
    table = {f"spk{i}": rng.standard_normal(8).tolist() for i in range(2)}
    out = str(tmp_path / "exported_dv")
    manifest = export_serving(model, variables, cfg, ap, out,
                              batch_sizes=(1,), text_buckets=(16,),
                              platforms=("cpu",), speaker_mode="dvector",
                              d_dim=8, speakers=table)
    assert manifest["speaker_input"] == {"kind": "dvector", "dim": 8}

    served = ExportedSynthesizer(out)
    text = rng.integers(1, N_CHARS, (1, 16)).astype(np.int32)
    lens = np.array([16], np.int32)
    dv0 = np.asarray(table["spk0"], np.float32)[None]
    dv1 = np.asarray(table["spk1"], np.float32)[None]
    wav0, _ = served(text, lens, seed=0, d_vectors=dv0)
    wav0b, _ = served(text, lens, seed=0, d_vectors=dv0)
    wav1, _ = served(text, lens, seed=0, d_vectors=dv1)
    np.testing.assert_array_equal(wav0, wav0b)
    assert np.abs(wav0 - wav1).max() > 1e-6  # conditioning reaches output
    with pytest.raises(ValueError, match="expects d_vectors"):
        served(text, lens)
    # named speaker through the wav-bytes path
    blob = served.tts_to_wav_bytes("ab", speaker="spk1")
    assert blob[:4] == b"RIFF"


def test_exported_tts_many_matches_single(tiny, tmp_path):
    """tts_many — the artifact half of dynamic micro-batched serving —
    must return per-request wavs identical to one-at-a-time decodes, with
    mixed named speakers conditioning per-row in one program call, and
    per-request speaker errors raised before any device work."""
    from your_voice_tts_tpu.text import symbols

    _, _, cfg, ap = tiny
    model = Tacotron2(len(symbols), cfg.model, n_mels=N_MELS, num_speakers=4,
                      speaker_embedding_dim=8)
    variables = model.init(jax.random.PRNGKey(3))
    rng = np.random.default_rng(9)
    table = {f"spk{i}": rng.standard_normal(8).tolist() for i in range(2)}
    out = str(tmp_path / "exported_many")
    export_serving(model, variables, cfg, ap, out, batch_sizes=(1, 4),
                   text_buckets=(16,), platforms=("cpu",),
                   speaker_mode="dvector", d_dim=8, speakers=table)
    served = ExportedSynthesizer(out)

    texts = ["hello there", "ab", "a longer line"]
    speakers = ["spk0", "spk1", "spk0"]
    wavs = served.tts_many(texts, speakers, seed=0)
    assert len(wavs) == 3
    # batch-invariant serving: same request, completely different
    # batchmates, same shape bucket -> bit-identical audio (per-row-
    # independent decode + shared GL phase init + per-row tail masking)
    other = served.tts_many([texts[0], "other words", "x"],
                            ["spk0", "spk1", "spk1"], seed=0)
    np.testing.assert_array_equal(wavs[0], other[0])
    # across bucket shapes (B=1 vs B=4 programs) XLA numerics differ at
    # ~1e-6 and Griffin-Lim's fixed-point iteration amplifies that, so
    # parity there is spectral-level, not bit-level
    for text, spk, wav in zip(texts, speakers, wavs):
        solo = served.tts_many([text], [spk], seed=0)[0]
        assert wav.shape == solo.shape
        rel = np.linalg.norm(wav - solo) / max(np.linalg.norm(solo), 1e-6)
        assert rel < 0.2, rel
    # speakers condition per-row: same text, different voices differ
    same = served.tts_many(["ab", "ab"], ["spk0", "spk1"], seed=0)
    assert np.abs(same[0] - same[1]).max() > 1e-6
    # errors are per-request and precede device work
    with pytest.raises(ValueError, match="unknown speaker"):
        served._resolve_speaker("nope")
    with pytest.raises(ValueError, match="speakers"):
        served.tts_many(texts, ["spk0"])
    # wav-bytes path rides the same code
    blob = served.tts_to_wav_bytes(texts[0], speaker="spk1")
    assert blob[:4] == b"RIFF" and blob[8:12] == b"WAVE"


def test_export_gst_style_input(tiny, tmp_path):
    """A GST artifact takes a style-reference mel input: conditioning
    reaches the output, short references tile into the exported window,
    and the result matches the live jitted program."""
    _, _, cfg, ap = tiny
    model = Tacotron2(N_CHARS, cfg.model, n_mels=N_MELS, use_gst=True)
    variables = model.init(jax.random.PRNGKey(2))
    out = str(tmp_path / "exported_gst")
    F = 8
    manifest = export_serving(model, variables, cfg, ap, out,
                              batch_sizes=(1,), text_buckets=(16,),
                              platforms=("cpu",), style_frames=F)
    assert manifest["style_input"] == {"frames": F, "num_mels": N_MELS}

    served = ExportedSynthesizer(out)
    rng = np.random.default_rng(7)
    text = rng.integers(1, N_CHARS, (1, 16)).astype(np.int32)
    lens = np.array([16], np.int32)
    sty0 = rng.standard_normal((1, F, N_MELS)).astype(np.float32)
    sty1 = rng.standard_normal((1, F, N_MELS)).astype(np.float32)
    wav0, _ = served(text, lens, seed=0, style_mel=sty0)
    wav1, _ = served(text, lens, seed=0, style_mel=sty1)
    assert np.abs(wav0 - wav1).max() > 1e-6  # style reaches the output

    live = make_serving_fn(model, variables, cfg, ap, style_frames=F)
    wav_live, _ = jax.jit(live)(jnp.asarray(text), jnp.asarray(lens),
                                jnp.asarray(sty0), jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(wav_live), wav0, atol=1e-5)
    # a 3-frame reference tiles into the 8-frame window
    short = sty0[:, :3]
    wav_s, _ = served(text, lens, seed=0, style_mel=short)
    tiled = np.tile(short, (1, 3, 1))[:, :F]
    wav_t, _ = served(text, lens, seed=0, style_mel=tiled)
    np.testing.assert_allclose(wav_s, wav_t, atol=1e-6)
    with pytest.raises(ValueError, match="expects style_mel"):
        served(text, lens)


def test_export_speaker_encoder_matches_live(tmp_path):
    """The exported GE2E encoder reproduces compute_embedding for both the
    short-utterance (tile) and sliding-window paths, including batch
    chunking through the exported shape."""
    from your_voice_tts_tpu.infer.export import (ExportedSpeakerEncoder,
                                                 export_speaker_encoder)
    from your_voice_tts_tpu.speaker_encoder.model import SpeakerEncoder

    enc = SpeakerEncoder(input_dim=N_MELS, proj_dim=16, lstm_dim=24,
                         num_layers=2)
    params = enc.init(jax.random.PRNGKey(0))
    out = str(tmp_path / "exported_se")
    manifest = export_speaker_encoder(enc, params, out, input_dim=N_MELS,
                                      batch_sizes=(2,), num_frames=12,
                                      platforms=("cpu",))
    assert manifest["proj_dim"] == 16
    served = ExportedSpeakerEncoder(out)

    rng = np.random.default_rng(6)
    for T in (7, 40):  # tile path; 5-window path (chunks of 2 through B=2)
        mel = rng.standard_normal((T, N_MELS)).astype(np.float32)
        live = np.asarray(enc.compute_embedding(params, jnp.asarray(mel),
                                                num_frames=12))
        got = served.embed(mel)
        np.testing.assert_allclose(got, live, atol=1e-5)
        assert abs(float(np.linalg.norm(got)) - 1.0) < 1e-4


def test_server_from_artifact_dir(tiny, tmp_path):
    """The HTTP server serves /api/tts straight from an export directory:
    ExportedSynthesizer provides tts_to_wav_bytes (manifest-recorded text
    frontend, wav trimmed to mel_lengths)."""
    import threading
    import urllib.request
    import wave as wavemod

    from your_voice_tts_tpu.infer.server import make_server
    from your_voice_tts_tpu.text import symbols

    _, _, base_cfg, ap = tiny
    # the served frontend emits real symbol-table ids, so the model's
    # embedding must cover the whole table (num_chars is manifest-checked)
    model = Tacotron2(len(symbols), base_cfg.model, n_mels=N_MELS)
    variables = model.init(jax.random.PRNGKey(0))

    class Data:
        use_phonemes = False
        text_cleaner = "basic_cleaners"
        phoneme_language = "en-us"
        enable_eos_bos_chars = False
        cmudict_path = None

    class Cfg:  # own copy — never mutate the module-scoped fixture
        model = base_cfg.model
        audio = base_cfg.audio
        data = Data()

    cfg = Cfg()
    out = str(tmp_path / "exported")
    export_serving(model, variables, cfg, ap, out, batch_sizes=(1,),
                   text_buckets=(32,), platforms=("cpu",))
    # vocab-mismatch guard: an artifact traced with a small vocab must
    # refuse text that maps past it instead of serving NaN audio
    tiny_model, tiny_vars, *_ = tiny
    out_small = str(tmp_path / "exported_small")
    export_serving(tiny_model, tiny_vars, cfg, ap, out_small,
                   batch_sizes=(1,), text_buckets=(32,), platforms=("cpu",))
    with pytest.raises(ValueError, match="different symbol table"):
        ExportedSynthesizer(out_small).tts_to_wav_bytes("hello artifact")
    served = ExportedSynthesizer(out)
    srv = make_server(served, host="127.0.0.1", port=0)
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/api/tts?text=hello%20artifact") as r:
            assert r.status == 200
            assert r.headers["Content-Type"] == "audio/wav"
            blob = r.read()
    finally:
        srv.shutdown()
    p = tmp_path / "out.wav"
    p.write_bytes(blob)
    with wavemod.open(str(p), "rb") as f:
        assert f.getframerate() == cfg.audio.sample_rate
        assert 0 < f.getnframes() <= \
            cfg.model.max_decoder_steps * cfg.model.r * cfg.audio.hop_length


def test_exported_pads_into_bucket(tiny, tmp_path):
    """A smaller request pads into the exported shape (only real rows
    return); an oversized batch chunks through the biggest exported batch;
    only an oversized TEXT bucket is an error."""
    model, variables, cfg, ap = tiny
    out = str(tmp_path / "exported")
    export_serving(model, variables, cfg, ap, out, batch_sizes=(4,),
                   text_buckets=(16,), platforms=("cpu",))
    served = ExportedSynthesizer(out)
    rng = np.random.default_rng(1)
    text = rng.integers(1, N_CHARS, (1, 9)).astype(np.int32)
    wav, mel_lens = served(text, np.array([9], np.int32))
    assert wav.shape[0] == 1 and mel_lens.shape == (1,)
    # B=6 through the B=4 artifact: chunks of 4 + 2. Row 4 sits at batch
    # position 0 of the second chunk, so it must match a solo call exactly
    # (GL phase keys are split per batch position).
    text6 = rng.integers(1, N_CHARS, (6, 16)).astype(np.int32)
    lens6 = np.full((6,), 16, np.int32)
    wav6, ml6 = served(text6, lens6)
    assert wav6.shape[0] == 6 and ml6.shape == (6,)
    wav_solo, ml_solo = served(text6[4:5], lens6[4:5])
    assert ml6[4] == ml_solo[0]
    np.testing.assert_allclose(wav6[4], wav_solo[0], atol=1e-6)
    with pytest.raises(ValueError, match="no exported shape fits"):
        served(np.zeros((1, 32), np.int32), np.full((1,), 32, np.int32))
