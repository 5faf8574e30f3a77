"""ParallelTTS (non-autoregressive family) tests: length-regulator
numerics vs a numpy reference, masking, training convergence, duration
round-trip, and an end-to-end text→mel→Griffin-Lim drive through the
standard model API."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from your_voice_tts_tpu.config import AudioConfig, Config, ModelConfig
from your_voice_tts_tpu.models import setup_model
from your_voice_tts_tpu.models.parallel_tts import (ParallelTTSLoss,
                                                    length_regulate,
                                                    uniform_durations)
from your_voice_tts_tpu.text import symbols

MCFG = ModelConfig(embedding_dim=32, encoder_dim=32, postnet_dim=32,
                   parallel_decoder_blocks=2, duration_predictor_dim=16,
                   max_decoder_steps=64, r=1)
N_MELS = 20


@pytest.fixture(scope="module")
def model_and_vars():
    cfg = Config(audio=AudioConfig(num_mels=N_MELS), model=dataclasses.replace(
        MCFG, model="ParallelTTS"))
    model = setup_model(len(symbols), 0, cfg)
    return model, model.init(jax.random.PRNGKey(0))


def test_length_regulate_matches_numpy_repeat():
    rng = np.random.default_rng(0)
    B, T, D, M = 3, 5, 4, 16
    enc = rng.standard_normal((B, T, D)).astype(np.float32)
    dur = np.array([[3, 0, 2, 4, 1],    # total 10
                    [1, 1, 1, 1, 1],    # total 5
                    [8, 8, 8, 0, 0]],   # total 24 -> truncated to 16
                   np.int32)
    frames, mask, idx, total = length_regulate(jnp.asarray(enc),
                                               jnp.asarray(dur), M)
    frames, mask, total = map(np.asarray, (frames, mask, total))
    for b in range(B):
        ref = np.repeat(enc[b], dur[b], axis=0)[:M]
        n = ref.shape[0]
        assert total[b] == n
        np.testing.assert_allclose(frames[b, :n], ref, rtol=1e-6)
        assert mask[b, :n].all() and not mask[b, n:].any()
        np.testing.assert_allclose(frames[b, n:], 0.0)


def test_uniform_durations_sum_exactly():
    tl = jnp.asarray([5, 3, 1], jnp.int32)
    ml = jnp.asarray([17, 9, 4], jnp.int32)
    d = np.asarray(uniform_durations(tl, ml, 6))
    np.testing.assert_array_equal(d.sum(axis=1), np.asarray(ml))
    for b, L in enumerate(np.asarray(tl)):
        assert (d[b, L:] == 0).all()
        assert (d[b, :L] > 0).all()


def test_forward_shapes_and_masking(model_and_vars):
    model, variables = model_and_vars
    rng = np.random.default_rng(1)
    B, T, M = 2, 12, 40
    text = jnp.asarray(rng.integers(1, len(symbols), (B, T)), jnp.int32)
    tl = jnp.asarray([12, 7], jnp.int32)
    ml = jnp.asarray([40, 22], jnp.int32)
    dur = uniform_durations(tl, ml, T)
    out = model.forward(variables, text, tl, dur, rng=jax.random.PRNGKey(0),
                        train=True, max_frames=M, return_alignments=True)
    assert out["postnet_outputs"].shape == (B, M, N_MELS)
    assert out["log_durations"].shape == (B, T)
    lens = np.asarray(out["mel_lengths"])
    np.testing.assert_array_equal(lens, np.asarray(ml))
    post = np.asarray(out["postnet_outputs"])
    assert np.abs(post[1, 22:]).max() == 0.0       # masked past row total
    al = np.asarray(out["alignments"])             # [B, M, T] one-hot
    np.testing.assert_allclose(al[0].sum(-1), np.ones(M))
    # pad tokens (row 1 has 7 real) never receive frames
    assert al[1, :, 7:].sum() == 0.0


def test_training_loss_decreases(model_and_vars):
    model, variables = model_and_vars
    import optax

    rng = np.random.default_rng(2)
    B, T, M = 4, 10, 32
    text = jnp.asarray(rng.integers(1, len(symbols), (B, T)), jnp.int32)
    tl = jnp.full((B,), T, jnp.int32)
    ml = jnp.full((B,), M, jnp.int32)
    dur = uniform_durations(tl, ml, T)
    mel = jnp.asarray(rng.standard_normal((B, M, N_MELS)) * 0.1, jnp.float32)
    criterion = ParallelTTSLoss()
    opt = optax.adam(1e-3)
    params, state = variables["params"], variables["state"]
    opt_state = opt.init(params)

    @jax.jit
    def step(params, state, opt_state, key):
        def loss_fn(p):
            out = model.forward({"params": p, "state": state}, text, tl, dur,
                                rng=key, train=True, max_frames=M)
            total, parts = criterion(out, mel, dur, tl)
            return total, (out["state"], parts)

        (loss, (new_state, _)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_state, opt_state, loss

    losses = []
    key = jax.random.PRNGKey(0)
    for i in range(12):
        key, sub = jax.random.split(key)
        params, state, opt_state, loss = step(params, state, opt_state, sub)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.9, losses


def test_inference_end_to_end_with_griffin_lim(model_and_vars):
    model, variables = model_and_vars
    from your_voice_tts_tpu.ops import dsp
    from your_voice_tts_tpu.ops.filters import hann_window

    rng = np.random.default_rng(3)
    acfg = AudioConfig(num_mels=N_MELS, fft_size=256, hop_length=64,
                       win_length=256, sample_rate=8000, mel_fmax=None)
    from your_voice_tts_tpu.audio import AudioProcessor

    ap = AudioProcessor(acfg)
    B, T = 2, 8
    text = jnp.asarray(rng.integers(1, len(symbols), (B, T)), jnp.int32)
    tl = jnp.asarray([8, 5], jnp.int32)
    out = model.inference(variables, text, tl, max_decoder_steps=48)
    assert out["postnet_outputs"].shape == (B, 48, N_MELS)
    lens = np.asarray(out["mel_lengths"])
    assert (lens >= 0).all() and (lens <= 48).all()
    window = jnp.asarray(hann_window(acfg.win_length, acfg.fft_size))
    wav = dsp.inv_melspectrogram_batch(
        out["postnet_outputs"], jax.random.PRNGKey(0),
        mel_inv_basis=jnp.asarray(ap.inv_mel_basis), window=window,
        n_fft=acfg.fft_size, hop=acfg.hop_length, preemph=acfg.preemphasis,
        ref_level_db=acfg.ref_level_db, min_level_db=acfg.min_level_db,
        spec_gain=acfg.spec_gain, max_norm=acfg.max_norm,
        symmetric=acfg.symmetric_norm, clip=acfg.clip_norm, power=acfg.power,
        gl_iters=4, gl_momentum=0.9)
    assert np.isfinite(np.asarray(wav)).all()


def test_speed_controls_durations(model_and_vars):
    model, variables = model_and_vars
    rng = np.random.default_rng(4)
    text = jnp.asarray(rng.integers(1, len(symbols), (1, 10)), jnp.int32)
    tl = jnp.asarray([10], jnp.int32)
    slow = model.inference(variables, text, tl, max_decoder_steps=64,
                           speed=0.5)
    fast = model.inference(variables, text, tl, max_decoder_steps=64,
                           speed=2.0)
    assert int(np.asarray(slow["durations"]).sum()) >= \
        int(np.asarray(fast["durations"]).sum())


def test_durations_from_alignment_repair():
    from your_voice_tts_tpu.bin.extract_durations import durations_from_alignment

    rng = np.random.default_rng(5)
    steps, T = 9, 6
    align = rng.random((steps, T)).astype(np.float32)
    # r=2, mel_len=17: last r-group overshoots by 1 -> repaired exactly
    d = durations_from_alignment(align, T, 17, r=2)
    assert d.sum() == 17 and (d >= 0).all() and d.shape == (T,)
    # degenerate single-token attention
    align1 = np.zeros((5, T), np.float32)
    align1[:, 2] = 1.0
    d1 = durations_from_alignment(align1, T, 10, r=2)
    assert d1.sum() == 10 and d1[2] == 10


@pytest.fixture(scope="module")
def styled_model_and_vars():
    """GST + energy-adaptor ParallelTTS (round-5 conditioning additions)."""
    from your_voice_tts_tpu.config import GSTConfig, SpeakerConfig

    cfg = Config(
        audio=AudioConfig(num_mels=N_MELS),
        model=dataclasses.replace(MCFG, model="ParallelTTS",
                                  parallel_energy_predictor=True),
        speakers=SpeakerConfig(use_gst=True,
                               gst=GSTConfig(gst_embedding_dim=32,
                                             gst_num_heads=2,
                                             gst_style_tokens=4)))
    model = setup_model(len(symbols), 0, cfg)
    return model, model.init(jax.random.PRNGKey(0))


def _styled_batch(rng, B=2, T=10, M=32):
    text = jnp.asarray(rng.integers(1, len(symbols), (B, T)), jnp.int32)
    tl = jnp.asarray([T, T - 3], jnp.int32)
    ml = jnp.asarray([M, M - 12], jnp.int32)
    dur = uniform_durations(tl, ml, T)
    mel = jnp.asarray(rng.standard_normal((B, M, N_MELS)) * 0.1, jnp.float32)
    return text, tl, ml, dur, mel


def test_gst_energy_forward_and_loss(styled_model_and_vars):
    """GST + energy model: forward returns energy_pred, the loss gains a
    finite energy term, and gradients flow into the gst/energy params."""
    from your_voice_tts_tpu.models.parallel_tts import frame_energy

    model, variables = styled_model_and_vars
    rng = np.random.default_rng(3)
    text, tl, ml, dur, mel = _styled_batch(rng)
    M = mel.shape[1]
    fm = jnp.arange(M)[None, :] < ml[:, None]
    out = model.forward(variables, text, tl, dur, rng=jax.random.PRNGKey(0),
                        train=True, max_frames=M, style_mel=mel,
                        style_len=ml, energies=frame_energy(mel, fm))
    assert out["energy_pred"].shape == (2, M)
    crit = ParallelTTSLoss()
    total, parts = crit(out, mel, dur, tl)
    assert "loss_energy" in parts and np.isfinite(float(parts["loss_energy"]))

    def loss(p):
        o = model.forward({"params": p, "state": variables["state"]}, text,
                          tl, dur, rng=jax.random.PRNGKey(0), train=True,
                          max_frames=M, style_mel=mel, style_len=ml,
                          energies=frame_energy(mel, fm))
        return crit(o, mel, dur, tl)[0]

    g = jax.jit(jax.grad(loss))(variables["params"])
    for group in ("gst", "energy", "energy_proj"):
        gn = jax.tree_util.tree_reduce(
            lambda a, x: a + float(jnp.abs(x).sum()), g[group], 0.0)
        assert np.isfinite(gn) and gn > 0, group


def test_gst_style_and_energy_scale_steer_inference(styled_model_and_vars):
    """Different style references and energy_scale values must change the
    synthesized mel (the conditioning paths are live at inference), and a
    no-style call must still run (GST branch skipped)."""
    model, variables = styled_model_and_vars
    rng = np.random.default_rng(4)
    text, tl, ml, dur, mel = _styled_batch(rng)
    base = model.inference(variables, text, tl, max_decoder_steps=48,
                           style_mel=mel, style_len=ml)
    other_style = model.inference(variables, text, tl, max_decoder_steps=48,
                                  style_mel=mel * 3.0 + 0.5, style_len=ml)
    scaled = model.inference(variables, text, tl, max_decoder_steps=48,
                             style_mel=mel, style_len=ml, energy_scale=1.5)
    d_style = float(jnp.abs(base["postnet_outputs"]
                            - other_style["postnet_outputs"]).max())
    d_energy = float(jnp.abs(base["postnet_outputs"]
                             - scaled["postnet_outputs"]).max())
    assert d_style > 0.0
    assert d_energy > 0.0
    no_style = model.inference(variables, text, tl, max_decoder_steps=48)
    assert np.isfinite(np.asarray(no_style["postnet_outputs"])).all()


def test_plain_checkpoint_layout_unchanged(model_and_vars):
    """The round-5 conditioning is opt-in: a default ParallelTTS has no
    gst/energy params (round-4 checkpoints keep loading bit-for-bit)."""
    _, variables = model_and_vars
    for k in ("gst", "energy", "energy_proj"):
        assert k not in variables["params"]
    assert "gst" not in variables["state"]


def test_conv_encoder_variant_trains_and_infers():
    """parallel_encoder="conv" (round-5 MFU lever: zero lax.scan anywhere
    in the model): loss decreases under Adam and inference is finite with
    correctly masked shapes."""
    import optax

    cfg = Config(audio=AudioConfig(num_mels=N_MELS),
                 model=dataclasses.replace(MCFG, model="ParallelTTS",
                                           parallel_encoder="conv"))
    model = setup_model(len(symbols), 0, cfg)
    v = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(7)
    B, T, M = 4, 10, 32
    text = jnp.asarray(rng.integers(1, len(symbols), (B, T)), jnp.int32)
    tl = jnp.full((B,), T, jnp.int32)
    ml = jnp.full((B,), M, jnp.int32)
    dur = uniform_durations(tl, ml, T)
    mel = jnp.asarray(rng.standard_normal((B, M, N_MELS)) * 0.1, jnp.float32)
    crit = ParallelTTSLoss()
    opt = optax.adam(2e-3)
    params, state = v["params"], v["state"]
    opt_state = opt.init(params)

    @jax.jit
    def step(p, s, o, k):
        def lf(p):
            out = model.forward({"params": p, "state": s}, text, tl, dur,
                                rng=k, train=True, max_frames=M)
            return crit(out, mel, dur, tl)[0]

        l, g = jax.value_and_grad(lf)(p)
        u, o = opt.update(g, o, p)
        return optax.apply_updates(p, u), o, l

    key = jax.random.PRNGKey(0)
    losses = []
    for _ in range(15):
        key, sub = jax.random.split(key)
        params, opt_state, l = step(params, state, opt_state, sub)
        losses.append(float(l))
    assert losses[-1] < losses[0]
    out = model.inference({"params": params, "state": state}, text, tl,
                          max_decoder_steps=48)
    assert np.isfinite(np.asarray(out["postnet_outputs"])).all()


def test_repair_row_durations():
    """Stale/mismatched durations rows are repaired to the loader's mel
    length: deficit extends the last real token, excess clips tail tokens,
    never negative (advisor r4 medium on train_parallel.batch_durations)."""
    from your_voice_tts_tpu.models.parallel_tts import repair_row_durations

    # exact match: unchanged
    np.testing.assert_array_equal(
        repair_row_durations([3, 4, 5, 0], 12, 4), [3, 4, 5, 0])
    # deficit: last REAL (nonzero) token extends, pad stays 0
    np.testing.assert_array_equal(
        repair_row_durations([3, 4, 5, 0], 15, 4), [3, 4, 8, 0])
    # excess clips from the tail, possibly through several tokens
    np.testing.assert_array_equal(
        repair_row_durations([3, 4, 5, 0], 6, 4), [3, 3, 0, 0])
    d = repair_row_durations([10, 10, 10], 5, 3)
    assert d.sum() == 5 and (d >= 0).all()
    # longer-than-T rows are truncated then repaired to the mel length
    d = repair_row_durations([2, 2, 2, 2, 2], 8, 3)
    assert d.shape == (3,) and d.sum() == 8
    # all-zero row: deficit lands on token 0
    np.testing.assert_array_equal(repair_row_durations([0, 0], 4, 2), [4, 0])


@pytest.mark.slow  # teacher forward + two CLI mains (~20 s warm)
def test_extract_then_train_parallel_end_to_end(tmp_path):
    """The full distillation recipe on the committed TRAINED teacher:
    extract durations from Tacotron2 alignments over a synthetic corpus,
    then train ParallelTTS on them for a few steps through the CLI."""
    import os

    from your_voice_tts_tpu.bin.extract_durations import main as extract_main
    from your_voice_tts_tpu.bin.train_parallel import main as train_main
    from your_voice_tts_tpu.data.synthetic import make_synthetic_corpus

    ckpt = os.path.join("assets", "bench_trained_smoke.npz")
    if not os.path.exists(ckpt):
        pytest.skip("trained smoke checkpoint not committed")
    corpus = str(tmp_path / "corpus")
    make_synthetic_corpus(corpus, n_items=12, sr=8000)
    durs = str(tmp_path / "durations.npz")
    extract_main(["--config", "configs/smoke_synthetic.json",
                  "--checkpoint", ckpt, "--data_path", corpus,
                  "--output", durs, "--batch_size", "8"])
    z = np.load(durs)
    assert len(z.files) >= 8
    assert all(z[k].sum() > 0 and (z[k] >= 0).all() for k in z.files)

    out_dir = str(tmp_path / "run")
    parts = train_main(["--config_path", "configs/smoke_synthetic.json",
                        "--data_path", corpus, "--durations", durs,
                        "--output_path", out_dir, "--max_steps", "3"])
    assert np.isfinite(parts["loss"])
    assert any(f.startswith("checkpoint_") for f in os.listdir(out_dir))


def test_train_parallel_uniform_smoke(tmp_path):
    """Uniform-duration bootstrap path: 2 steps through the CLI main."""
    from your_voice_tts_tpu.bin.train_parallel import main as train_main
    from your_voice_tts_tpu.data.synthetic import make_synthetic_corpus

    corpus = str(tmp_path / "corpus")
    make_synthetic_corpus(corpus, n_items=8, sr=8000)
    parts = train_main(["--config_path", "configs/smoke_synthetic.json",
                        "--data_path", corpus, "--max_steps", "2"])
    assert np.isfinite(parts["loss"])
    assert "loss_duration" in parts


def test_synthesizer_glue_drives_parallel_tts(tmp_path):
    """The standard serving stack (Synthesizer -> sentence split -> GL ->
    wav container) drives ParallelTTS unchanged — and even an untrained
    duration predictor yields non-degenerate audio (min 1 frame per real
    token at inference)."""
    from your_voice_tts_tpu.config import load_config
    from your_voice_tts_tpu.infer.synthesizer import Synthesizer

    cfg = load_config("configs/smoke_synthetic.json")
    cfg = dataclasses.replace(cfg, model=dataclasses.replace(
        cfg.model, model="ParallelTTS", max_decoder_steps=128, r=1))
    synth = Synthesizer(cfg, None)
    wav = synth.tts_to_wav_bytes("Parallel speech.")
    assert wav[:4] == b"RIFF" and len(wav) > 500


def test_parallel_tts_exports_to_aot_artifact(tmp_path):
    """The StableHLO serving-export path bakes ParallelTTS end-to-end
    (text ids -> durations -> parallel decode -> GL -> wav) with NO
    model-specific changes; the artifact reproduces the live program
    exactly."""
    import tempfile

    from your_voice_tts_tpu.audio import AudioProcessor
    from your_voice_tts_tpu.config import load_config
    from your_voice_tts_tpu.infer.export import (ExportedSynthesizer,
                                                 export_serving,
                                                 make_serving_fn)

    cfg = load_config("configs/smoke_synthetic.json")
    cfg = dataclasses.replace(cfg, model=dataclasses.replace(
        cfg.model, model="ParallelTTS", max_decoder_steps=96, r=1))
    model = setup_model(len(symbols), 0, cfg)
    variables = model.init(jax.random.PRNGKey(0))
    ap = AudioProcessor(cfg.audio)
    rng = np.random.default_rng(0)
    text = np.zeros((2, 32), np.int32)
    text[:, :20] = rng.integers(1, len(symbols), (2, 20))
    lens = np.asarray([20, 14], np.int32)
    td = str(tmp_path / "artifact")
    export_serving(model, variables, cfg, ap, td, batch_sizes=(2,),
                   text_buckets=(32,), platforms=("cpu",))
    served = ExportedSynthesizer(td)
    live = jax.jit(make_serving_fn(model, variables, cfg, ap))
    wl, ll = live(jnp.asarray(text), jnp.asarray(lens), jax.random.PRNGKey(0))
    we, le = served(text, lens, seed=0)
    assert float(np.abs(np.asarray(wl) - we).max()) <= 1e-4
    np.testing.assert_array_equal(np.asarray(ll), le)


def test_multispeaker_dvector_conditioning():
    """d-vector conditioning changes the output (cloning path parity with
    the autoregressive families), and the speaker-id table path runs."""
    cfg = Config(audio=AudioConfig(num_mels=N_MELS), model=dataclasses.replace(
        MCFG, model="ParallelTTS"))
    model = setup_model(len(symbols), 0, cfg, speaker_embedding_dim=16)
    variables = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(6)
    text = jnp.asarray(rng.integers(1, len(symbols), (2, 8)), jnp.int32)
    tl = jnp.full((2,), 8, jnp.int32)
    d1 = jnp.asarray(rng.standard_normal((2, 16)), jnp.float32)
    d2 = jnp.asarray(rng.standard_normal((2, 16)), jnp.float32)
    o1 = model.inference(variables, text, tl, max_decoder_steps=32,
                         speaker_embeddings=d1)
    o2 = model.inference(variables, text, tl, max_decoder_steps=32,
                         speaker_embeddings=d2)
    diff = float(np.abs(np.asarray(o1["postnet_outputs"])
                        - np.asarray(o2["postnet_outputs"])).max())
    assert diff > 1e-4, "d-vector must condition the output"

    id_model = setup_model(len(symbols), 4, cfg)
    id_vars = id_model.init(jax.random.PRNGKey(1))
    oa = id_model.inference(id_vars, text, tl, max_decoder_steps=32,
                            speaker_ids=jnp.asarray([0, 1], jnp.int32))
    ob = id_model.inference(id_vars, text, tl, max_decoder_steps=32,
                            speaker_ids=jnp.asarray([2, 3], jnp.int32))
    assert float(np.abs(np.asarray(oa["postnet_outputs"])
                        - np.asarray(ob["postnet_outputs"])).max()) > 1e-4


def test_train_parallel_multispeaker_dvectors(tmp_path):
    """The CLI trains a d-vector-conditioned ParallelTTS from a
    speakers.json mapping (the parallel family's cloning path)."""
    import json

    from your_voice_tts_tpu.bin.train_parallel import main as train_main
    from your_voice_tts_tpu.data.synthetic import make_synthetic_corpus

    corpus = str(tmp_path / "corpus")
    make_synthetic_corpus(corpus, n_items=8, sr=8000, n_speakers=2)
    rng = np.random.default_rng(7)
    spk_json = str(tmp_path / "speakers.json")
    with open(spk_json, "w") as f:
        json.dump({f"SYN{i:02d}": rng.standard_normal(16).tolist()
                   for i in range(2)}, f)
    parts = train_main(["--config_path", "configs/smoke_synthetic.json",
                        "--data_path", corpus, "--speakers_json", spk_json,
                        "--max_steps", "2"])
    assert np.isfinite(parts["loss"])
