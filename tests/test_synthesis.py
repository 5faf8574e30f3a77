"""Inference runtime tests: synthesis API, Synthesizer facade, HTTP server
(driven over a real socket)."""

import dataclasses
import json
import os
import threading
import urllib.parse
import urllib.request
import wave as wavemod

import numpy as np
import pytest

from your_voice_tts_tpu.audio import AudioProcessor
from your_voice_tts_tpu.config import load_config
from your_voice_tts_tpu.infer.synthesis import synthesis, synthesis_batch, text_to_seq
from your_voice_tts_tpu.infer.synthesizer import Synthesizer, split_into_sentences
from your_voice_tts_tpu.models import setup_model
from your_voice_tts_tpu.text import symbols
from your_voice_tts_tpu.train.checkpoint import save_checkpoint


@pytest.fixture(scope="module")
def cfg():
    base = load_config("configs/smoke_synthetic.json")
    return dataclasses.replace(
        base, model=dataclasses.replace(base.model, max_decoder_steps=12))


@pytest.fixture(scope="module")
def model_and_vars(cfg):
    import jax

    model = setup_model(len(symbols), 0, cfg)
    return model, model.init(jax.random.PRNGKey(0))


@pytest.fixture(scope="module")
def ap(cfg):
    return AudioProcessor(cfg.audio)


def test_text_to_seq(cfg):
    seq = text_to_seq("Hello there!", cfg)
    assert seq.dtype == np.int32 and len(seq) > 0


def test_synthesis_single(cfg, model_and_vars, ap):
    model, variables = model_and_vars
    res = synthesis(model, variables, "hello world", cfg, ap)
    assert set(res) >= {"wav", "mel_postnet_spec", "alignment", "stop_tokens"}
    assert res["mel_postnet_spec"].shape[0] == cfg.audio.num_mels
    assert res["wav"].ndim == 1 and len(res["wav"]) > 0


def test_synthesis_batch_matches_padding(cfg, model_and_vars, ap):
    model, variables = model_and_vars
    texts = ["short one", "a somewhat longer sentence to pad against", "mid size text"]
    results = synthesis_batch(model, variables, texts, cfg, ap,
                              use_griffin_lim=False)
    assert len(results) == 3
    for r in results:
        assert r["mel_postnet_spec"].shape[0] == cfg.audio.num_mels
        assert "wav" not in r  # griffin-lim disabled


def test_split_into_sentences():
    text = "First one. Second here! Third?  \n Fourth line"
    assert split_into_sentences(text) == [
        "First one.", "Second here!", "Third?", "Fourth line"]
    assert split_into_sentences("") == []


def test_synthesizer_with_checkpoint(cfg, model_and_vars, ap, tmp_path):
    model, variables = model_and_vars
    ckpt = str(tmp_path / "model.npz")
    save_checkpoint(ckpt, params=variables["params"],
                    model_state=variables["state"], opt_state={}, step=123,
                    epoch=1, r=2)
    synth = Synthesizer(cfg, ckpt)
    wav = synth.tts("One sentence. And another one.")
    assert wav.dtype == np.float32 and len(wav) > 0
    # wav bytes form a valid WAV container
    blob = synth.tts_to_wav_bytes("Quick check.")
    assert blob[:4] == b"RIFF" and blob[8:12] == b"WAVE"


@pytest.fixture(scope="module")
def server_env(cfg, model_and_vars, tmp_path_factory):
    """(url, server, synthesizer) for socket tests; the synthesizer is
    exposed so the micro-batching test can boot its own server with a wide
    collation window without slowing the single-request tests here."""
    model, variables = model_and_vars
    tmp = tmp_path_factory.mktemp("srv")
    ckpt = str(tmp / "model.npz")
    save_checkpoint(ckpt, params=variables["params"],
                    model_state=variables["state"], opt_state={}, step=1,
                    epoch=0, r=2)
    from your_voice_tts_tpu.infer.server import make_server

    synth = Synthesizer(cfg, ckpt)
    srv = make_server(synth, host="127.0.0.1", port=0)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{port}", srv, synth
    srv.shutdown()
    srv.batcher.close()


@pytest.fixture(scope="module")
def server(server_env):
    return server_env[0]


def test_server_index(server):
    with urllib.request.urlopen(server + "/") as r:
        body = r.read().decode()
    assert r.status == 200 and "api/tts" in body
    # regression: format-escaped braces served raw made the CSS invalid
    assert "{{" not in body and "}}" not in body


def test_server_tts_endpoint(server, tmp_path):
    with urllib.request.urlopen(server + "/api/tts?text=hello%20server") as r:
        assert r.status == 200
        assert r.headers["Content-Type"] == "audio/wav"
        blob = r.read()
    p = tmp_path / "out.wav"
    p.write_bytes(blob)
    with wavemod.open(str(p), "rb") as f:
        assert f.getframerate() == 8000
        assert f.getnframes() > 0


def test_server_missing_text_is_400(server):
    import urllib.error

    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(server + "/api/tts")
    assert ei.value.code == 400
    assert json.loads(ei.value.read())["error"] == "missing text parameter"


def test_server_unknown_route_404(server):
    import urllib.error

    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(server + "/nope")
    assert ei.value.code == 404


def test_server_streaming_endpoint(server_env):
    """stream=1 serves chunked audio/wav: a streaming WAV header chunk,
    then one PCM chunk per decoded text piece (tts_streaming) — the raw
    socket framing is asserted so 'streaming' means actual incremental
    chunks, not one buffered body."""
    import socket

    url, _, _ = server_env
    host, port = url.rsplit(":", 1)[0].split("//")[1], int(url.rsplit(":", 1)[1])
    with socket.create_connection((host, port), timeout=120) as s:
        s.sendall(b"GET /api/tts?text=One%20sentence.%20And%20another%20one."
                  b"&stream=1 HTTP/1.1\r\nHost: x\r\n\r\n")
        s.settimeout(120)
        raw = b""
        while not raw.endswith(b"0\r\n\r\n"):
            got = s.recv(65536)
            if not got:
                break
            raw += got
    head, _, body = raw.partition(b"\r\n\r\n")
    assert b"200" in head.split(b"\r\n")[0]
    assert b"Transfer-Encoding: chunked" in head
    assert b"Content-Length" not in head
    chunks = []
    while body and not body.startswith(b"0\r\n"):
        size_hex, _, body = body.partition(b"\r\n")
        n = int(size_hex, 16)
        chunks.append(body[:n])
        body = body[n + 2:]
    # chunk 0 is the unknown-length WAV header; then >=2 audio pieces
    # (the two sentences decode as separate tts_streaming chunks)
    assert len(chunks) >= 3
    assert chunks[0][:4] == b"RIFF" and chunks[0][8:12] == b"WAVE"
    pcm = b"".join(chunks[1:])
    audio = np.frombuffer(pcm, "<i2")
    assert len(audio) > 1000 and np.abs(audio).max() > 0


def test_server_streaming_via_standard_client(server):
    """The streamed response must be consumable by a STANDARD http client.
    Regression: chunked transfer framing is an HTTP/1.1 feature — under the
    stdlib default protocol_version ("HTTP/1.0") clients do not de-chunk,
    so the hex chunk-size lines landed inside the WAV byte stream."""
    with urllib.request.urlopen(
            server + "/api/tts?text=One%20sentence.%20And%20more.&stream=1",
            timeout=120) as r:
        assert r.status == 200
        assert r.headers["Content-Type"] == "audio/wav"
        body = r.read()  # http.client de-chunks per the response protocol
    assert body[:4] == b"RIFF" and body[8:12] == b"WAVE"
    pcm = np.frombuffer(body[44:len(body) - (len(body) - 44) % 2], "<i2")
    assert len(pcm) > 1000 and np.abs(pcm).max() > 0


def test_server_coalesces_concurrent_requests(server_env):
    """Concurrent HTTP requests must ride ONE batched device call
    (infer/batching.MicroBatcher + Synthesizer.tts_many), not serialize
    into batch-1 synthesis like the reference's Flask server."""
    from your_voice_tts_tpu.infer.server import make_server

    _, _, synth = server_env
    # wide collation window so the burst below coalesces deterministically
    srv = make_server(synth, host="127.0.0.1", port=0,
                      max_batch=8, max_delay_ms=400.0)
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        texts = ["first voice line", "a second one", "third request",
                 "and the fourth"]
        blobs = [None] * len(texts)
        errors = [None] * len(texts)

        def fetch(k):
            q = urllib.parse.quote(texts[k])
            try:
                with urllib.request.urlopen(
                        f"http://127.0.0.1:{port}/api/tts?text={q}",
                        timeout=120) as r:
                    blobs[k] = (r.status, r.headers["Content-Type"], r.read())
            except Exception as e:  # noqa: BLE001 — recorded for assertions
                errors[k] = e

        threads = [threading.Thread(target=fetch, args=(k,))
                   for k in range(len(texts))]
        for t in threads:
            t.start()
        for t in threads:
            t.join(120)
        assert errors == [None] * len(texts)
        for status, ctype, blob in blobs:
            assert status == 200 and ctype == "audio/wav"
            assert blob[:4] == b"RIFF" and blob[8:12] == b"WAVE"
        # the burst shared device batches instead of running one-by-one
        assert max(srv.batcher.batch_sizes) > 1
        assert len(srv.batcher.batch_sizes) < len(texts)
    finally:
        srv.shutdown()
        srv.batcher.close()


def test_synthesizer_streaming_yields_chunks(cfg, model_and_vars, tmp_path):
    """tts_streaming must yield one wav chunk per text piece with decoder
    state carried between pieces (inference_truncated path)."""
    model, variables = model_and_vars
    ckpt = str(tmp_path / "m.npz")
    save_checkpoint(ckpt, params=variables["params"],
                    model_state=variables["state"], opt_state={}, step=1,
                    epoch=0, r=2)
    synth = Synthesizer(cfg, ckpt)
    chunks = list(synth.tts_streaming("Sentence one. Sentence two."))
    assert len(chunks) == 2
    for c in chunks:
        assert c.dtype == np.float32 and c.ndim == 1 and len(c) > 0
        assert np.all(np.isfinite(c))


def test_synthesizer_streaming_with_neural_vocoder(cfg, model_and_vars,
                                                   tmp_path):
    """Streaming chunks must route through the neural vocoder when one is
    loaded: each chunk's length equals mel frames x the vocoder's upsample
    product (regression: the mel handed to mel_to_wav must be [n_mels, T],
    and the return is already the 1-D waveform)."""
    from your_voice_tts_tpu.config import AudioConfig as VAudio
    from your_voice_tts_tpu.vocoder.config import MelganConfig, VocoderConfig

    model, variables = model_and_vars
    ckpt = str(tmp_path / "m.npz")
    save_checkpoint(ckpt, params=variables["params"],
                    model_state=variables["state"], opt_state={}, step=1,
                    epoch=0, r=2)
    vcfg = VocoderConfig(
        model="melgan",
        audio=VAudio(sample_rate=8000, fft_size=256, hop_length=64,
                     win_length=256, num_mels=cfg.audio.num_mels,
                     mel_fmax=None, do_trim_silence=False),
        melgan=MelganConfig(upsample_factors=(4, 4, 4), base_channels=8,
                            num_res_blocks=1, num_scales=1,
                            disc_base_channels=4))
    synth = Synthesizer(cfg, ckpt, vocoder_config=vcfg)
    chunks = list(synth.tts_streaming("One. Two."))
    assert len(chunks) == 2
    for c in chunks:
        assert c.dtype == np.float32 and c.ndim == 1
        assert len(c) % 64 == 0 and len(c) > 0  # frames x upsample product
        assert np.all(np.isfinite(c))


@pytest.mark.slow  # ~21 s on the 1-core box; dryrun_multichip also covers it
def test_synthesis_batch_mesh_matches_unsharded(cfg, ap):
    """Data-parallel serving over the 8-virtual-device mesh: batch sharded,
    params replicated, per-row results equal to the unsharded path (dropout
    off so both paths are deterministic). 5 texts also exercises the
    pad-to-device-multiple path (5 -> 8 rows)."""
    import jax

    from your_voice_tts_tpu.parallel import make_mesh

    nd_cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, prenet_dropout=False))
    model = setup_model(len(symbols), 0, nd_cfg)
    variables = model.init(jax.random.PRNGKey(0))
    texts = ["Hello there.", "A second sentence!", "Third.",
             "Four scores and seven years ago.", "Fifth one."]
    mesh = make_mesh()
    res_mesh = synthesis_batch(model, variables, texts, nd_cfg, ap,
                               use_griffin_lim=False, mesh=mesh)
    assert len(res_mesh) == len(texts)

    # reference: the same batch through plain model.inference (the mesh path
    # wraps exactly this call in shard_map)
    import jax.numpy as jnp

    from your_voice_tts_tpu.infer.synthesis import _pad_texts
    seqs = [text_to_seq(t, nd_cfg) for t in texts]
    text_arr, lengths = _pad_texts(seqs)
    ref = model.inference(variables, jnp.asarray(text_arr),
                          jnp.asarray(lengths))
    mels_ref = np.asarray(ref["postnet_outputs"])
    lens_ref = np.asarray(ref["mel_lengths"])
    for i, a in enumerate(res_mesh):
        L = max(int(lens_ref[i]), model.r)
        np.testing.assert_allclose(a["mel_postnet_spec"],
                                   mels_ref[i, :L].T, atol=1e-4)


def test_speaker_resolution_numeric_and_unknown(cfg, model_and_vars,
                                                tmp_path):
    """Numeric speaker strings (HTTP query args) resolve as ids; unknown
    names raise with the known list (regression: '2' silently became
    speaker 0, unknown names KeyError'd deep in d-vector lookup)."""
    import json as jsonmod

    spk_json = tmp_path / "speakers.json"
    spk_json.write_text(jsonmod.dumps({"alice": 0, "bob": 1}))
    # no checkpoint: resolution logic is what's under test (a random-init
    # 2-speaker model synthesizes fine)
    synth = Synthesizer(cfg, None, speakers_json=str(spk_json))
    wav = synth.tts("hi there", speaker="1")  # numeric string -> id 1
    assert wav.ndim == 1 and len(wav) > 0
    with pytest.raises(ValueError, match="unknown speaker"):
        synth.tts("hi", speaker="carol")
    with pytest.raises(ValueError, match="out of range"):
        synth.tts("hi", speaker=7)


def test_streaming_speaker_conditioning(cfg, tmp_path):
    """tts_streaming threads the speaker through inference_truncated:
    different speakers stream different audio; unknown names raise before
    any chunk is produced (so the HTTP layer can still 500 cleanly)."""
    import json as jsonmod

    spk_json = tmp_path / "speakers.json"
    spk_json.write_text(jsonmod.dumps({"alice": 0, "bob": 1}))
    synth = Synthesizer(cfg, None, speakers_json=str(spk_json))
    a = np.concatenate(list(synth.tts_streaming("One line. Two lines.",
                                                speaker="alice")))
    b = np.concatenate(list(synth.tts_streaming("One line. Two lines.",
                                                speaker="bob")))
    assert len(a) > 0 and len(b) > 0
    n = min(len(a), len(b))
    assert np.abs(a[:n] - b[:n]).max() > 1e-6  # conditioning reaches audio
    with pytest.raises(ValueError, match="unknown speaker"):
        next(synth.tts_streaming("hi", speaker="carol"))
