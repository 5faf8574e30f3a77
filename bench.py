"""Benchmark harness — prints ONE JSON line for the driver.

Measures batched end-to-end synthesis (Tacotron2 decode to max steps +
Griffin-Lim vocoder, full-size model dims) on the available accelerator and
reports the real-time factor per chip:

    RTF = seconds of audio produced / wall-clock second

BASELINE.json's north star is >=100x real time per TPU chip; `vs_baseline`
is value/100. The reference publishes no numbers (BASELINE.json:13
published={}), so the target is the baseline.

Run: python bench.py [--quick]
"""

from __future__ import annotations

import argparse
import atexit
import contextlib
import json
import os
import re
import sys
import threading
import time
import traceback

import numpy as np

_ANSI_RE = re.compile(r"\x1b\[[0-9;]*[a-zA-Z]")


def _short_err(e: BaseException, limit: int = 200) -> str:
    """One short sanitized sentence for the JSON line; the full traceback
    goes to stderr. Round 3's record was lost because a raw 4.7 KB axon log
    (ANSI escapes and all) was embedded in an error field, pushing the ONE
    JSON line past the driver's tail-capture window — error fields must be
    bounded no matter what the exception carries."""
    traceback.print_exc(file=sys.stderr)
    sys.stderr.flush()
    msg = _ANSI_RE.sub("", f"{type(e).__name__}: {e}")
    msg = " ".join(msg.split())
    return msg[:limit]


def _note(msg: str) -> None:
    """Progress narration: stderr only — stdout stays the one JSON line."""
    print(f"[bench +{time.time() - _T_START:.0f}s] {msg}",
          file=sys.stderr, flush=True)


_T_START = time.time()


class _Watchdog:
    """Per-section deadline enforced from a daemon thread.

    The remote-TPU tunnel can wedge INSIDE a compile — the main thread then
    blocks in a futex wait where neither signals nor exceptions can reach
    it. The watchdog thread prints a PARTIAL but parseable JSON line (the
    headline result if it landed, a zero-value error line otherwise, plus
    per-section status) and hard-exits, so the driver always records
    something within minutes of a wedge instead of nothing after a silent
    half hour (VERDICT r3 next #8)."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._section: str | None = None
        self._deadline = 0.0
        self._t0 = 0.0
        self._last_beat = 0.0
        self.status: dict[str, str] = {}
        self._partial: dict = {
            "metric": "e2e_synthesis_realtime_factor", "value": 0.0,
            "unit": "x_realtime_per_chip", "vs_baseline": 0.0,
            "error": "bench killed by watchdog before the headline landed"}
        threading.Thread(target=self._run, daemon=True).start()

    def set_partial(self, result: dict) -> None:
        """Adopt `result` (mutated in place by later sections) as the line
        to emit on a wedge."""
        with self._lock:
            self._partial = result

    def begin(self, name: str, budget_s: float) -> None:
        _note(f"section {name}: start (budget {budget_s:.0f}s)")
        t0 = time.time()
        with self._lock:
            self._section, self._deadline = name, t0 + budget_s
            self._t0 = self._last_beat = t0
            self.status[name] = "running"

    def end(self, name: str, ok: bool = True) -> None:
        self.status[name] = "ok" if ok else "error"
        with self._lock:
            self._section = None
            t0 = self._t0
        _note(f"section {name}: {self.status[name]} in {time.time() - t0:.0f}s")

    @contextlib.contextmanager
    def section(self, name: str, budget_s: float):
        self.begin(name, budget_s)
        try:
            yield
        except BaseException:
            self.end(name, ok=False)
            raise
        else:
            self.end(name, ok=True)

    def _run(self) -> None:
        while True:
            time.sleep(5)
            with self._lock:
                sec, dl, t0 = self._section, self._deadline, self._t0
                partial = self._partial
            if sec is None:
                continue
            now = time.time()
            if now > dl:
                extra = partial.setdefault("extra", {})
                extra[f"{sec}_error"] = (
                    f"section exceeded its {dl - t0:.0f}s watchdog budget "
                    "(wedged remote-TPU tunnel?); bench killed")
                extra["bench_sections"] = dict(self.status)
                try:
                    line = json.dumps(partial)
                except Exception:
                    line = json.dumps({
                        "metric": "e2e_synthesis_realtime_factor",
                        "value": 0.0, "unit": "x_realtime_per_chip",
                        "vs_baseline": 0.0,
                        "error": f"watchdog kill in section {sec}"})
                print(line, flush=True)
                _note(f"WATCHDOG: section {sec} exceeded {dl - t0:.0f}s; "
                      "emitted partial line and exiting")
                os._exit(3)
            if now - self._last_beat >= 60:
                self._last_beat = now
                _note(f"section {sec}: still running "
                      f"({now - t0:.0f}s of {dl - t0:.0f}s budget)")


def _probe_backend(timeout_s: int = 240) -> str | None:
    """Return an error string if JAX backend init cannot complete in time.

    The remote-TPU (axon) tunnel in this environment can wedge INDEFINITELY
    after a TPU-holding process dies mid-run — even bare ``jax.devices()``
    blocks with ~0 CPU. Probing in a killable subprocess turns "bench hangs
    forever and records nothing" into a recorded, explained failure line."""
    import subprocess

    try:
        proc = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s, capture_output=True, text=True)
    except subprocess.TimeoutExpired:
        return (f"JAX backend init did not complete within {timeout_s}s "
                "(remote-TPU tunnel wedge); rerun when the lease recovers")
    if proc.returncode != 0:
        return f"JAX backend init failed: {proc.stderr[-500:]}"
    return None


def _setup_compile_cache() -> None:
    """Persistent XLA compile cache, same as tests/conftest.py — without it
    every bench invocation pays cold compiles over the remote-TPU tunnel
    (~20-40 s each), which made `--verify` too slow to gate commits
    (VERDICT r2 weak #2)."""
    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def dispatch_roundtrip_ms(n: int = 7) -> float:
    """Median host->device->host round trip for a trivial jitted op.

    Wall-clock latencies measured over the remote-TPU tunnel include this
    constant; reporting it separately makes round-over-round deltas
    attributable to compute vs link (VERDICT r2 weak #4)."""
    import jax
    import jax.numpy as jnp

    tiny = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((8,), jnp.float32)
    float(tiny(x)[0])  # compile
    ts = []
    for _ in range(n):
        t0 = time.time()
        float(tiny(x)[0])
        ts.append(time.time() - t0)
    return sorted(ts)[len(ts) // 2] * 1000.0


def trained_latency_extras(quick: bool) -> dict:
    """p50/p95 single-utterance latency on a TRAINED model with REAL
    stop-token early exit (VERDICT r1: the fixed-length random-weight p50 is
    not a latency distribution). Trains the smoke-size Tacotron2 on the
    synthetic corpus (cached under .bench_cache) and times
    inference_incremental over a spread of utterance lengths."""
    import dataclasses
    import os

    import jax
    import jax.numpy as jnp

    from your_voice_tts_tpu.config import load_config
    from your_voice_tts_tpu.data.synthetic import make_synthetic_corpus
    from your_voice_tts_tpu.infer.synthesis import text_to_seq
    from your_voice_tts_tpu.models import setup_model
    from your_voice_tts_tpu.text import symbols
    from your_voice_tts_tpu.train.checkpoint import load_checkpoint, save_checkpoint

    here = os.path.dirname(os.path.abspath(__file__))
    cache = os.path.join(here, ".bench_cache")
    os.makedirs(cache, exist_ok=True)
    # preferred: the committed 8000-step checkpoint (stop tokens verified to
    # fire — a 1500-step model never learns them, so the r1 bench measured a
    # cap-bound decode and reported trained_stop_rate 0.0); fallback: train
    # the same recipe into the local cache
    ckpt = os.path.join(here, "assets", "bench_trained_smoke.npz")
    if not os.path.exists(ckpt):
        ckpt = os.path.join(cache, "trained_smoke.npz")
    cfg = load_config(os.path.join(here, "configs", "smoke_synthetic.json"))
    # longer decode budget than the smoke default so stop tokens, not the
    # cap, terminate decoding; raise the smoke config's 2-epoch cap so
    # fit(max_steps=N) actually reaches N steps (48 items / batch 8 =
    # 6 steps/epoch)
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, max_decoder_steps=256),
        training=dataclasses.replace(cfg.training, epochs=2000))
    model = setup_model(len(symbols), 0, cfg)
    variables = model.init(jax.random.PRNGKey(0))

    if not os.path.exists(ckpt):
        from your_voice_tts_tpu.train.trainer import Trainer

        corpus = os.path.join(cache, "corpus")
        if not os.path.exists(os.path.join(corpus, "metadata.csv")):
            # max_words=15: the latency test sentences run up to ~30 words,
            # and the stopnet only generalizes to lengths it has seen
            make_synthetic_corpus(corpus, n_items=64,
                                  sr=cfg.audio.sample_rate, max_words=15)
        ds = dataclasses.replace(cfg.data.datasets[0], path=corpus)
        tcfg = dataclasses.replace(
            cfg, data=dataclasses.replace(cfg.data, datasets=(ds,)))
        trainer = Trainer(tcfg, output_path=None, verbose=False)
        # 8000 steps: the synthetic-corpus stopnet crosses the 0.6 stop
        # threshold around step 7500 (see assets/ provenance); cached after
        trainer.fit(max_steps=8000)
        save_checkpoint(ckpt, params=trainer.state.params,
                        model_state=trainer.state.model_state, opt_state={},
                        step=int(trainer.state.step), epoch=0, r=tcfg.model.r)
    params, state, _, meta = load_checkpoint(
        ckpt, params=variables["params"], model_state=variables["state"],
        opt_state=None)
    variables = {"params": params, "state": state}
    model.set_r(meta.get("r", cfg.model.r))

    sentences = [
        "Hi there.",
        "The quick brown fox jumps over the lazy dog.",
        "Speech synthesis on tensor processing units is remarkably fast "
        "when the whole decode runs as one compiled loop.",
        "A quarter of a century has passed since the first edition appeared, "
        "and the problems it addressed remain with us to this day in every "
        "corner of the printing trade.",
    ]
    cap = cfg.model.max_decoder_steps * model.r
    lat, produced, stopped = [], [], 0
    for rep in range(2):
        for s in sentences:
            seq = text_to_seq(s, cfg)
            text = jnp.asarray(seq, jnp.int32)[None]
            lens = jnp.asarray([len(seq)], jnp.int32)
            t0 = time.time()
            out = model.inference_incremental(variables, text, lens,
                                              chunk_steps=32)
            n = int(out["mel_lengths"][0])  # host sync: decode fully done
            if rep > 0:  # first pass pays compiles
                lat.append(time.time() - t0)
                produced.append(n)
                stopped += int(n < cap)
    lat.sort()
    hop, sr = cfg.audio.resolved_hop_win()[0], cfg.audio.sample_rate
    audio_s = float(np.mean(produced)) * hop / sr
    extras = {
        "p50_trained_early_exit_ms": round(lat[len(lat) // 2] * 1000.0, 1),
        "p95_trained_early_exit_ms": round(lat[-1] * 1000.0, 1),
        "trained_mean_frames": round(float(np.mean(produced)), 1),
        "trained_mean_audio_s": round(audio_s, 2),
        # honesty gate: fraction of utterances whose STOP TOKEN (not the
        # step cap) ended decoding — early-exit latency only means something
        # when this is close to 1
        "trained_stop_rate": round(stopped / max(len(produced), 1), 2),
    }

    # the Pallas decode route (in-kernel early exit, ONE launch per
    # utterance): texts bucket-padded to T=192 (covers the longest test
    # sentence) so every call shares a compile, like a serving frontend would
    if getattr(model, "pallas_decode_supported", lambda T: False)(192):
        kernel_infer = jax.jit(
            lambda v, t, l: model.inference(v, t, l, use_pallas=True))
        lat_k = []
        for rep in range(2):
            for s in sentences:
                seq = text_to_seq(s, cfg)
                text = np.zeros((1, 192), np.int32)
                text[0, : len(seq)] = seq
                lens = jnp.asarray([len(seq)], jnp.int32)
                t0 = time.time()
                out = kernel_infer(variables, jnp.asarray(text), lens)
                int(out["mel_lengths"][0])  # host sync
                if rep > 0:
                    lat_k.append(time.time() - t0)
        lat_k.sort()
        extras["p50_trained_kernel_ms"] = round(
            lat_k[len(lat_k) // 2] * 1000.0, 1)
        extras["p95_trained_kernel_ms"] = round(lat_k[-1] * 1000.0, 1)

        # device-time estimate: back-to-back dispatches with ONE host sync at
        # the end (a data-dependent scalar, which cannot resolve early) —
        # amortizes the remote-tunnel round trip out of the per-call number,
        # so wall (above) - amortized (here) ~= dispatch (VERDICT r2 weak #4)
        reps = 3
        total = jnp.zeros((), jnp.int32)
        t0 = time.time()
        for _ in range(reps):
            for s in sentences:
                seq = text_to_seq(s, cfg)
                text = np.zeros((1, 192), np.int32)
                text[0, : len(seq)] = seq
                lens = jnp.asarray([len(seq)], jnp.int32)
                out = kernel_infer(variables, jnp.asarray(text), lens)
                total = total + out["mel_lengths"][0]
        int(total)  # single host sync for the whole chain
        extras["trained_kernel_device_ms_amortized"] = round(
            (time.time() - t0) / (reps * len(sentences)) * 1000.0, 1)
    extras["dispatch_roundtrip_ms"] = round(dispatch_roundtrip_ms(), 1)
    return extras


def _peak_bf16_tflops(device_kind: str) -> float:
    """Peak dense bf16 TFLOP/s per chip by TPU generation (public specs);
    used only for the MFU report."""
    table = [("TPU v6", 918.0), ("TPU v5p", 459.0), ("TPU v5", 197.0),
             ("TPU v4", 275.0), ("TPU v3", 123.0), ("TPU v2", 46.0)]
    for prefix, peak in table:
        if device_kind.startswith(prefix):
            return peak
    return 197.0


def quality_extras(quick: bool = False) -> dict:
    """Objective quality gates on the committed trained checkpoint
    (VERDICT r2 missing #3): free-run synthesis of HELD-OUT synthetic
    items (a corpus seed the checkpoint never saw) scored by DTW-aligned
    mel-cepstral distortion against the ground-truth mel, plus stop-token
    precision/recall/F1 against the true utterance lengths."""
    import dataclasses
    import os
    import tempfile

    import jax
    import jax.numpy as jnp

    from your_voice_tts_tpu.audio import AudioProcessor
    from your_voice_tts_tpu.config import load_config
    from your_voice_tts_tpu.data.formatters import synthetic as synthetic_fmt
    from your_voice_tts_tpu.data.synthetic import make_synthetic_corpus
    from your_voice_tts_tpu.infer.synthesis import text_to_seq
    from your_voice_tts_tpu.models import setup_model
    from your_voice_tts_tpu.text import symbols
    from your_voice_tts_tpu.train.checkpoint import load_checkpoint
    from your_voice_tts_tpu.utils.quality import (
        mel_cepstral_distortion, prf, stop_token_scores)

    here = os.path.dirname(os.path.abspath(__file__))
    ckpt = os.path.join(here, "assets", "bench_trained_smoke.npz")
    if not os.path.exists(ckpt):
        return {"quality_error": "no trained checkpoint"}
    cfg = load_config(os.path.join(here, "configs", "smoke_synthetic.json"))
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, max_decoder_steps=256))
    model = setup_model(len(symbols), 0, cfg)
    variables = model.init(jax.random.PRNGKey(0))
    params, state, _, meta = load_checkpoint(
        ckpt, params=variables["params"], model_state=variables["state"],
        opt_state=None)
    variables = {"params": params, "state": state}
    model.set_r(meta.get("r", cfg.model.r))
    ap = AudioProcessor(cfg.audio)

    # held-out items: same generator, a seed the checkpoint never trained on.
    # Round-5 protocol scale-up (VERDICT r4 next #2): 32 items (from 6) —
    # one missed stop is now 3% recall, not 17%, and MCD means are stable
    # to ~0.1 dB across seeds.
    n_items = 3 if quick else 32
    with tempfile.TemporaryDirectory() as tmp:
        make_synthetic_corpus(tmp, n_items=n_items, sr=cfg.audio.sample_rate,
                              seed=20260817, max_words=10)
        items = synthetic_fmt(tmp)
        mcds, stop_counts = [], []
        for text, wav_path, _spk in items:
            wav = ap.load_wav(wav_path)
            gt_mel = ap.melspectrogram(wav).T          # [T, n_mels] normalized
            seq = text_to_seq(text, cfg)
            out = model.inference(variables, jnp.asarray(seq, jnp.int32)[None],
                                  jnp.asarray([len(seq)], jnp.int32))
            n = int(out["mel_lengths"][0]) or out["postnet_outputs"].shape[1]
            pred = np.asarray(out["postnet_outputs"][0, :n])
            mcds.append(mel_cepstral_distortion(
                pred, gt_mel, cfg=cfg.audio,
                stats=getattr(ap, "mel_stats", None)))
            # stop timing in r-group steps vs ground-truth length
            stops = np.asarray(out["stop_probs"][0])
            target_steps = -(-gt_mel.shape[0] // model.r)
            stop_counts.append(stop_token_scores(
                stops, target_steps, thresh=cfg.model.stop_threshold,
                tol=max(3, target_steps // 8)))
    scores = prf(stop_counts)
    out = {
        "mcd_mean_db": round(float(np.mean(mcds)), 2),
        "mcd_worst_db": round(float(np.max(mcds)), 2),
        "stop_precision": scores["precision"],
        "stop_recall": scores["recall"],
        "stop_f1": scores["f1"],
        "quality_n_items": n_items,
    }

    # ParallelTTS quality on the SAME held-out protocol (round-4 family;
    # checkpoint distilled from the trained Tacotron2 teacher, 20k Adam
    # steps on a 256-item synthetic corpus). Measured at landing: MCD 4.03
    # mean / 4.57 worst — BETTER than the autoregressive teacher's
    # 7.6/8.13 (a parallel decoder has no free-run feedback drift), and
    # backend-stable (CPU 4.02 vs TPU 4.03).
    pckpt = os.path.join(here, "assets", "bench_trained_parallel.npz")
    if os.path.exists(pckpt):
        pcfg = dataclasses.replace(cfg, model=dataclasses.replace(
            cfg.model, model="ParallelTTS", max_decoder_steps=512, r=1))
        pmodel = setup_model(len(symbols), 0, pcfg)
        pvars = pmodel.init(jax.random.PRNGKey(0))
        pparams, pstate, _, _ = load_checkpoint(
            pckpt, params=pvars["params"], model_state=pvars["state"],
            opt_state=None)
        pvars = {"params": pparams, "state": pstate}
        pmcds, plen_errs = [], []
        with tempfile.TemporaryDirectory() as tmp:
            make_synthetic_corpus(tmp, n_items=n_items,
                                  sr=cfg.audio.sample_rate,
                                  seed=20260817, max_words=10)
            for text, wav_path, _spk in synthetic_fmt(tmp):
                wav = ap.load_wav(wav_path)
                gt_mel = ap.melspectrogram(wav).T
                seq = text_to_seq(text, pcfg)
                po = pmodel.inference(
                    pvars, jnp.asarray(seq, jnp.int32)[None],
                    jnp.asarray([len(seq)], jnp.int32),
                    max_decoder_steps=512)
                n = int(po["mel_lengths"][0]) or po[
                    "postnet_outputs"].shape[1]
                pmcds.append(mel_cepstral_distortion(
                    np.asarray(po["postnet_outputs"][0, :n]), gt_mel,
                    cfg=pcfg.audio, stats=getattr(ap, "mel_stats", None)))
                plen_errs.append(abs(n - gt_mel.shape[0])
                                 / gt_mel.shape[0])
        out["parallel_mcd_mean_db"] = round(float(np.mean(pmcds)), 2)
        out["parallel_mcd_worst_db"] = round(float(np.max(pmcds)), 2)
        out["parallel_len_err_frac"] = round(float(np.mean(plen_errs)), 3)

    # GST + energy-adaptor ParallelTTS variant (round-5, VERDICT r4 next
    # #7): same held-out protocol, style-conditioned on the ground-truth
    # utterance (the training-time conditioning), so the delta vs the plain
    # parallel checkpoint isolates what the conditioning buys.
    gckpt = os.path.join(here, "assets", "bench_trained_parallel_gst.npz")
    if os.path.exists(gckpt):
        try:
            from your_voice_tts_tpu.config import GSTConfig, SpeakerConfig

            gcfg = dataclasses.replace(
                cfg,
                model=dataclasses.replace(
                    cfg.model, model="ParallelTTS", max_decoder_steps=512,
                    r=1, parallel_energy_predictor=True),
                speakers=SpeakerConfig(
                    use_gst=True, gst=GSTConfig(gst_embedding_dim=32,
                                                gst_num_heads=2,
                                                gst_style_tokens=4)))
            gmodel = setup_model(len(symbols), 0, gcfg)
            gvars = gmodel.init(jax.random.PRNGKey(0))
            gparams, gstate, _, _ = load_checkpoint(
                gckpt, params=gvars["params"], model_state=gvars["state"],
                opt_state=None)
            gvars = {"params": gparams, "state": gstate}
            gmcds = []
            with tempfile.TemporaryDirectory() as tmp:
                make_synthetic_corpus(tmp, n_items=n_items,
                                      sr=cfg.audio.sample_rate,
                                      seed=20260817, max_words=10)
                for text, wav_path, _spk in synthetic_fmt(tmp):
                    wav = ap.load_wav(wav_path)
                    gt_mel = ap.melspectrogram(wav).T
                    seq = text_to_seq(text, gcfg)
                    go = gmodel.inference(
                        gvars, jnp.asarray(seq, jnp.int32)[None],
                        jnp.asarray([len(seq)], jnp.int32),
                        max_decoder_steps=512,
                        style_mel=jnp.asarray(gt_mel[None]),
                        style_len=jnp.asarray([gt_mel.shape[0]], jnp.int32))
                    n = int(go["mel_lengths"][0]) or \
                        go["postnet_outputs"].shape[1]
                    gmcds.append(mel_cepstral_distortion(
                        np.asarray(go["postnet_outputs"][0, :n]), gt_mel,
                        cfg=gcfg.audio, stats=getattr(ap, "mel_stats",
                                                      None)))
            out["parallel_gst_mcd_mean_db"] = round(float(np.mean(gmcds)), 2)
            out["parallel_gst_mcd_worst_db"] = round(float(np.max(gmcds)), 2)
        except Exception as e:
            out["parallel_gst_error"] = _short_err(e)

    # WAVEFORM-domain quality gate (VERDICT r4 next #1): copy-synthesis
    # multi-res STFT distance — ground-truth mel -> vocoder -> waveform,
    # scored against the ground-truth AUDIO (aligned by construction, so
    # the metric isolates vocoder quality from TTS duration error). GL
    # needs no checkpoint; MelGAN uses the trained smoke vocoder asset.
    try:
        from your_voice_tts_tpu.vocoder.losses import multi_scale_stft_loss

        n_wave = 3 if quick else 8
        gl_d, mg_d = [], []
        voc = None
        mckpt = os.path.join(here, "assets", "bench_trained_melgan.npz")
        if os.path.exists(mckpt):
            from your_voice_tts_tpu.vocoder.synthesizer import (
                VocoderSynthesizer)

            voc = VocoderSynthesizer(
                os.path.join(here, "configs", "melgan_smoke.json"), mckpt)
        with tempfile.TemporaryDirectory() as tmp:
            make_synthetic_corpus(tmp, n_items=n_wave,
                                  sr=cfg.audio.sample_rate,
                                  seed=20260817, max_words=10)
            for text, wav_path, _spk in synthetic_fmt(tmp):
                gt = ap.load_wav(wav_path)
                gt_mel = ap.melspectrogram(gt)            # [n_mels, T]
                y_gl = np.asarray(ap.inv_melspectrogram(gt_mel))
                Lc = min(len(gt), len(y_gl))
                gl_d.append(float(multi_scale_stft_loss(
                    jnp.asarray(y_gl[None, :Lc]), jnp.asarray(gt[None, :Lc]))))
                if voc is not None:
                    y_mg = np.asarray(voc.mel_to_wav(gt_mel))
                    Lc = min(len(gt), len(y_mg))
                    mg_d.append(float(multi_scale_stft_loss(
                        jnp.asarray(y_mg[None, :Lc]),
                        jnp.asarray(gt[None, :Lc]))))
        out["gl_copy_synth_mrstft"] = round(float(np.mean(gl_d)), 3)
        if mg_d:
            out["melgan_copy_synth_mrstft"] = round(float(np.mean(mg_d)), 3)
    except Exception as e:
        out["waveform_gate_error"] = _short_err(e)
    return out


def gl_sweep_extras(B: int = 448, T: int = 500) -> dict:
    """Griffin-Lim iteration sweep at the headline serving shape (VERDICT r4
    next #3: '24 iters is inherited, not derived'). Round-5 measurement on
    v5e (this code): recon err 0.151/0.077/0.049 and wall 116/177/221 ms at
    12/24/32 iters, bf16 == f32 in BOTH err and wall (the kernel's matmul
    dtype is not the bound), and the per-iteration slope ~5.3 ms at B=448 is
    ~93% of bf16 MXU peak (2 x Tp x n_fft^2 MACs/row/iter) — the kernel is
    at speed-of-light, so iteration count is the ONLY remaining lever and it
    trades reconstruction error smoothly (no knee: err keeps improving
    through 32). 24 stays shipped: cutting to 16 would save ~18% headline
    wall but raise the audible GL floor by 54% rel err."""
    import jax
    import jax.numpy as jnp

    from your_voice_tts_tpu.config import AudioConfig
    from your_voice_tts_tpu.ops import dsp
    from your_voice_tts_tpu.ops.filters import hann_window
    from your_voice_tts_tpu.ops.pallas.griffin_lim import (
        griffin_lim_pallas_wave)

    acfg = AudioConfig()
    n_fft, hop = acfg.fft_size, acfg.hop_length
    w = jnp.asarray(hann_window(acfg.win_length, n_fft), jnp.float32)
    rng = np.random.default_rng(0)
    sr = acfg.sample_rate
    t = np.arange(hop * (T + 5)) / sr
    sigs = []
    for i in range(8):  # speech-like harmonic rows, different f0s
        f0 = 110 * (1.15 ** (i % 6))
        vib = f0 * (1 + 0.02 * np.sin(2 * np.pi * 4.5 * t))
        ph = 2 * np.pi * np.cumsum(vib) / sr
        x = sum((1.0 / h) * np.sin(h * ph + 0.3 * h) for h in range(1, 10))
        x = x * (0.55 + 0.45 * np.sin(2 * np.pi * 2.2 * t)) * 0.25
        x += 0.01 * rng.standard_normal(len(t))
        sigs.append(x[: hop * (T + 3)])
    wavs = np.stack(sigs).astype(np.float32)
    L = jnp.int32(wavs.shape[1])
    S = jnp.abs(jax.vmap(lambda y: dsp.stft(y, L, n_fft, hop, w))(
        jnp.asarray(wavs)))[:, :T]
    S_big = jnp.tile(S, (max(1, B // 8), 1, 1))

    out = {}
    walls = {}
    for iters in (12, 24, 32):
        y = griffin_lim_pallas_wave(S, 0, n_iters=iters, n_fft=n_fft,
                                    hop=hop, window=w, momentum=0.95)
        L2 = jnp.int32(y.shape[1])
        S2 = jnp.abs(jax.vmap(
            lambda v: dsp.stft(v, L2, n_fft, hop, w))(y))[:, :T]
        err = float(jnp.linalg.norm(S2 - S) / jnp.linalg.norm(S))
        f = jax.jit(lambda s, it=iters: jnp.abs(griffin_lim_pallas_wave(
            s, 0, n_iters=it, n_fft=n_fft, hop=hop, window=w,
            momentum=0.95)).sum())
        float(f(S_big))
        ts = []
        for _ in range(3):
            t0 = time.time()
            float(f(S_big))
            ts.append(time.time() - t0)
        walls[iters] = min(ts)
        out[f"gl_err_{iters}"] = round(err, 4)
        out[f"gl_ms_{iters}"] = round(walls[iters] * 1e3, 1)
    per_iter_s = (walls[32] - walls[12]) / 20.0
    Tp = ((T + 7) // 8) * 8
    flops_per_iter = S_big.shape[0] * 2 * Tp * n_fft * n_fft * 2
    peak = _peak_bf16_tflops(jax.devices()[0].device_kind) * 1e12
    out["gl_per_iter_ms"] = round(per_iter_s * 1e3, 2)
    out["gl_iter_mxu_frac"] = round(flops_per_iter / per_iter_s / peak, 3)
    return out


def cloning_extras() -> dict:
    """Cloning selectivity on the committed TRAINED multi-speaker checkpoint
    (VERDICT r2 missing #4): synthesize one sentence per speaker, re-embed
    the generated mel with the trained GE2E encoder, and report the mean
    cos(target) - max cos(non-target) margin."""
    import dataclasses
    import os

    import jax
    import jax.numpy as jnp

    from your_voice_tts_tpu.config import load_config
    from your_voice_tts_tpu.infer.synthesis import text_to_seq
    from your_voice_tts_tpu.models import setup_model
    from your_voice_tts_tpu.speaker_encoder.model import SpeakerEncoder
    from your_voice_tts_tpu.text import symbols
    from your_voice_tts_tpu.train.checkpoint import load_checkpoint
    from your_voice_tts_tpu.utils.speakers import load_speaker_mapping, parse_speakers

    here = os.path.dirname(os.path.abspath(__file__))
    ckpt = os.path.join(here, "assets", "bench_trained_multispeaker.npz")
    enc_ckpt = os.path.join(here, "assets", "speaker_encoder_smoke.npz")
    spk_json = os.path.join(here, "assets", "speakers_smoke.json")
    if not all(os.path.exists(p) for p in (ckpt, enc_ckpt, spk_json)):
        return {"cloning_error": "multispeaker assets missing"}
    _, dvecs = parse_speakers(load_speaker_mapping(spk_json))
    names = sorted(dvecs)
    spk_dim = len(dvecs[names[0]])

    enc = SpeakerEncoder(input_dim=20, proj_dim=spk_dim, lstm_dim=128,
                         num_layers=2)
    enc_params, _, _, _ = load_checkpoint(
        enc_ckpt, params=enc.init(jax.random.PRNGKey(0)),
        model_state=None, opt_state=None)

    cfg = load_config(os.path.join(here, "configs", "smoke_synthetic.json"))
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, max_decoder_steps=256),
        speakers=dataclasses.replace(
            cfg.speakers, use_speaker_embedding=True,
            use_external_speaker_embedding_file=True,
            speaker_embedding_dim=spk_dim))
    model = setup_model(len(symbols), len(names), cfg, spk_dim)
    variables = model.init(jax.random.PRNGKey(0))
    params, state, _, meta = load_checkpoint(
        ckpt, params=variables["params"], model_state=variables["state"],
        opt_state=None)
    variables = {"params": params, "state": state}
    model.set_r(meta.get("r", cfg.model.r))

    # two sentences per speaker: at the round-5 8-speaker assets this is 16
    # cloning trials per round (was 4 at the old 4-speaker/1-sentence scale)
    sents = ["the quick brown fox jumps over a lazy dog.",
             "seven wizards brew magic tonic under calm evening skies."]
    margins = []
    for spk in names:
        for sent in sents:
            seq = text_to_seq(sent, cfg)
            d = jnp.asarray(dvecs[spk])[None]
            out = model.inference(variables,
                                  jnp.asarray(seq, jnp.int32)[None],
                                  jnp.asarray([len(seq)], jnp.int32),
                                  speaker_embeddings=d)
            n = int(out["mel_lengths"][0]) or out["postnet_outputs"].shape[1]
            mel = jnp.asarray(np.asarray(out["postnet_outputs"][0, :n]))
            e = np.asarray(enc.compute_embedding(enc_params, mel,
                                                 num_frames=40))
            sims = {o: float(e @ np.asarray(dvecs[o])) for o in names}
            margins.append(sims[spk]
                           - max(v for o, v in sims.items() if o != spk))
    return {
        "cloning_mean_margin": round(float(np.mean(margins)), 3),
        "cloning_selective_frac": round(
            sum(m > 0 for m in margins) / len(margins), 2),
        "cloning_n_trials": len(margins),
    }


def serving_extras() -> dict:
    """Dynamic micro-batched serving vs the reference's one-at-a-time model:
    N concurrent requests through the HTTP server's real collation path
    (infer/batching.MicroBatcher + infer/server._batch_fn + tts_many) vs the
    same N served sequentially batch-1 (what the reference's Flask server
    does under concurrency)."""
    import dataclasses
    import os
    import threading

    from your_voice_tts_tpu.config import load_config
    from your_voice_tts_tpu.infer.batching import MicroBatcher
    from your_voice_tts_tpu.infer.server import _batch_fn
    from your_voice_tts_tpu.infer.synthesizer import Synthesizer

    here = os.path.dirname(os.path.abspath(__file__))
    ckpt = os.path.join(here, "assets", "bench_trained_smoke.npz")
    cfg = load_config(os.path.join(here, "configs", "smoke_synthetic.json"))
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, max_decoder_steps=256))
    synth = Synthesizer(cfg, ckpt if os.path.exists(ckpt) else None)

    reqs = [
        "Hi there.", "The quick brown fox jumps over the lazy dog.",
        "Speech synthesis on tensor processing units is fast.",
        "A quarter of a century has passed since the first edition.",
    ] * 4  # 16 concurrent users
    synth.tts_to_wav_bytes(reqs[0])  # pay compiles outside the timings

    def concurrent_wall() -> tuple[float, float]:
        batcher = MicroBatcher(_batch_fn(synth), max_batch=len(reqs),
                               max_delay_ms=25.0)
        try:
            errs = []

            def call(t):
                try:
                    batcher.submit((t, None), timeout=600)
                except Exception as e:  # noqa: BLE001
                    errs.append(e)

            threads = [threading.Thread(target=call, args=(t,))
                       for t in reqs]
            t0 = time.time()
            for th in threads:
                th.start()
            for th in threads:
                th.join(600)
            wall = time.time() - t0
            if errs:
                raise errs[0]
            mean_b = float(np.mean(batcher.batch_sizes))
        finally:
            batcher.close()
        return wall, mean_b

    concurrent_wall()  # the batched-shape compile
    wall_c, mean_b = concurrent_wall()

    for t in set(reqs):  # every batch-1 bucket compiles outside the timing
        synth.tts_to_wav_bytes(t)
    t0 = time.time()
    for t in reqs:
        synth.tts_to_wav_bytes(t)
    wall_s = time.time() - t0

    return {
        "serving_concurrent_rps": round(len(reqs) / wall_c, 1),
        "serving_serial_rps": round(len(reqs) / wall_s, 1),
        "serving_microbatch_speedup": round(wall_s / wall_c, 2),
        "serving_mean_batch": round(mean_b, 1),
    }


def capability_matrix_extras() -> dict:
    """One number per remaining BASELINE.json config (the headline + trained
    block already cover configs 1 and 3's metrics at serving time):
    config 2 Tacotron2+MelGAN batched, config 3 teacher-forced training
    throughput, config 4 WaveRNN batched folding, config 5 d-vector cloning
    inference. Each is try/except'd by the caller — a failure never loses
    the headline."""
    import jax
    import jax.numpy as jnp

    from your_voice_tts_tpu.config import AudioConfig, Config, ModelConfig, TrainingConfig
    from your_voice_tts_tpu.models import setup_model
    from your_voice_tts_tpu.models.losses import TacotronLoss
    from your_voice_tts_tpu.text import symbols
    from your_voice_tts_tpu.vocoder.models.melgan import MelganGenerator
    from your_voice_tts_tpu.vocoder.models.wavernn import WaveRNN

    rng = np.random.default_rng(0)
    acfg = AudioConfig()
    sr = acfg.sample_rate
    out = {}

    def timeit(fn, *args, n=3):
        chk = fn(*args)   # compile
        ts = []
        for _ in range(n):
            t0 = time.time()
            chk = fn(*args)
            ts.append(time.time() - t0)
        del chk
        return float(np.median(ts))

    # --- config 2: Tacotron2 + MelGAN, batched inference (batch=8) ----------
    model = setup_model(len(symbols), 0, Config(audio=acfg, model=ModelConfig()))
    variables = model.init(jax.random.PRNGKey(0))
    gen = MelganGenerator()
    gp = gen.init(jax.random.PRNGKey(1))
    B, T_text, steps = 8, 64, 250
    text = jnp.asarray(rng.integers(1, len(symbols), (B, T_text)), jnp.int32)
    lens = jnp.full((B,), T_text, jnp.int32)

    @jax.jit
    def taco_melgan(variables, gp, text, lens):
        o = model.inference(variables, text, lens, max_decoder_steps=steps)
        wav = gen(gp, o["postnet_outputs"])
        return jnp.abs(wav).sum()

    dt = timeit(lambda *a: float(taco_melgan(*a)), variables, gp, text, lens)
    audio_s = B * steps * model.r * acfg.hop_length / sr
    out["taco2_melgan_batch8_rtf"] = round(audio_s / dt, 1)

    # --- config 3: teacher-forced training step (mixed precision) -----------
    from your_voice_tts_tpu.train.optim import build_optimizer

    tcfg = Config(audio=acfg, model=ModelConfig(r=2),
                  training=TrainingConfig(batch_size=32, mixed_precision=True))
    tmodel = setup_model(len(symbols), 0, tcfg)
    tvars = tmodel.init(jax.random.PRNGKey(0))
    criterion = TacotronLoss()
    optimizer = build_optimizer(tcfg.training)
    opt_state = optimizer.init(tvars["params"])
    Bt, Tt, Tm = 32, 128, 400
    batch = {
        "text": jnp.asarray(rng.integers(1, len(symbols), (Bt, Tt)), jnp.int32),
        "text_lengths": jnp.full((Bt,), Tt, jnp.int32),
        "mel": jnp.asarray(rng.standard_normal((Bt, Tm, 80)), jnp.float32),
        "mel_lengths": jnp.full((Bt,), Tm, jnp.int32),
        "stop_targets": jnp.zeros((Bt, Tm // 2), jnp.float32),
    }

    def loss_fn(params, state, batch, key):
        cast = lambda t: jax.tree_util.tree_map(  # noqa: E731
            lambda a: a.astype(jnp.bfloat16)
            if a.dtype == jnp.float32 else a, t)
        o = tmodel.forward({"params": cast(params), "state": state},
                           batch["text"], batch["text_lengths"],
                           batch["mel"].astype(jnp.bfloat16), rng=key,
                           train=True)
        o = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.float32)
            if hasattr(a, "dtype") and a.dtype == jnp.bfloat16 else a, o)
        total, _ = criterion(o, batch["mel"], batch["mel_lengths"],
                             batch["stop_targets"], batch["text_lengths"],
                             step=0, r=2)
        return total

    @jax.jit
    def train_step(params, state, opt_state, batch, key):
        loss, grads = jax.value_and_grad(loss_fn)(params, state, batch, key)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        return params, opt_state, loss

    params, state = tvars["params"], tvars["state"]

    def one_step(params, state, opt_state, batch):
        p2, o2, loss = train_step(params, state, opt_state, batch,
                                  jax.random.PRNGKey(0))
        return float(loss)

    dt = timeit(one_step, params, state, opt_state, batch)
    out["train_step_ms_bf16"] = round(dt * 1000.0, 1)
    out["train_mel_frames_per_s"] = round(Bt * Tm / dt, 0)

    # MFU: XLA's own FLOP count for the whole compiled step (fwd+bwd+opt)
    # against the chip's peak bf16 throughput (VERDICT r2 next #7)
    try:
        compiled = train_step.lower(params, state, opt_state, batch,
                                    jax.random.PRNGKey(0)).compile()
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops = float(ca.get("flops", 0.0))
        if flops > 0:
            kind = jax.devices()[0].device_kind
            peak = _peak_bf16_tflops(kind) * 1e12
            out["train_step_tflops"] = round(flops / 1e12, 3)
            out["train_step_mfu"] = round(flops / dt / peak, 4)
    except Exception as e:
        out["mfu_error"] = _short_err(e)

    # Throughput bucket: the step is recurrence-serialization-bound (200
    # sequential scan steps re-stream the decoder weights each step, so
    # arithmetic intensity ~= B FLOP per weight byte; the v5e roofline knee
    # is ~240).  Measured scaling B=32/64/128/256 -> 198k/332k/464k/512k
    # mel frames/s: B=128 is the knee of the curve and the recommended
    # large-corpus bucket size; per-step latency at fixed B is already at
    # the weight-streaming floor (decision on record in STATUS.md).
    batch128 = {
        "text": jnp.asarray(rng.integers(1, len(symbols), (128, Tt)), jnp.int32),
        "text_lengths": jnp.full((128,), Tt, jnp.int32),
        "mel": jnp.asarray(rng.standard_normal((128, Tm, 80)), jnp.float32),
        "mel_lengths": jnp.full((128,), Tm, jnp.int32),
        "stop_targets": jnp.zeros((128, Tm // 2), jnp.float32),
    }
    dt = timeit(one_step, params, state, opt_state, batch128)
    out["train_step_ms_bf16_b128"] = round(dt * 1000.0, 1)
    out["train_mel_frames_per_s_b128"] = round(128 * Tm / dt, 0)
    try:
        compiled = train_step.lower(params, state, opt_state, batch128,
                                    jax.random.PRNGKey(0)).compile()
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops = float(ca.get("flops", 0.0))
        if flops > 0:
            out["train_step_mfu_b128"] = round(
                flops / dt / (_peak_bf16_tflops(
                    jax.devices()[0].device_kind) * 1e12), 4)
    except Exception:
        pass

    # High-batch supported mode (round-4, configs/ljspeech_tacotron2_b384):
    # B=384 is the measured v5e knee (B=512 flat). Timed CHAINED — N steps
    # dispatched, ONE host readback — because that is how the real training
    # loop runs; per-call timing adds the ~30 ms remote-tunnel roundtrip to
    # every step (round-4 sweep: 269 ms/step per-call vs 235 chained).
    try:
        batch384 = {
            "text": jnp.asarray(rng.integers(1, len(symbols), (384, Tt)),
                                jnp.int32),
            "text_lengths": jnp.full((384,), Tt, jnp.int32),
            "mel": jnp.asarray(rng.standard_normal((384, Tm, 80)),
                               jnp.float32),
            "mel_lengths": jnp.full((384,), Tm, jnp.int32),
            "stop_targets": jnp.zeros((384, Tm // 2), jnp.float32),
        }
        p384, o384, l384 = train_step(params, state, opt_state, batch384,
                                      jax.random.PRNGKey(0))
        float(l384)  # compile + warm
        N384 = 6
        t0 = time.time()
        p384, o384 = params, opt_state
        for i in range(N384):
            p384, o384, l384 = train_step(p384, state, o384, batch384,
                                          jax.random.PRNGKey(i))
        float(l384)
        dt384 = (time.time() - t0) / N384
        out["train_step_ms_bf16_b384_chained"] = round(dt384 * 1000.0, 1)
        out["train_mel_frames_per_s_b384"] = round(384 * Tm / dt384, 0)
        compiled = train_step.lower(params, state, opt_state, batch384,
                                    jax.random.PRNGKey(0)).compile()
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops = float(ca.get("flops", 0.0))
        if flops > 0:
            out["train_step_mfu_b384"] = round(
                flops / dt384 / (_peak_bf16_tflops(
                    jax.devices()[0].device_kind) * 1e12), 4)
    except Exception as e:
        out["b384_error"] = _short_err(e)

    # --- config 4: WaveRNN batched folding (Pallas kernel) -------------------
    wr = WaveRNN()   # full-size: rnn 512, 10 res blocks, 10-bit mu-law
    wp = wr.init(jax.random.PRNGKey(0))
    mel = jnp.asarray(rng.standard_normal((1400, 80)), jnp.float32)  # ~16 s

    @jax.jit
    def wr_gen_j(wp, mel, key):
        wav = wr.generate(wp, mel, key, batched=True)
        return jnp.abs(wav).sum()

    def wr_gen():
        return float(wr_gen_j(wp, mel, jax.random.PRNGKey(1)))

    dt = timeit(wr_gen, n=2)
    n_samples = (1400 - 2 * wr.pad) * acfg.hop_length
    out["wavernn_fold_rtf"] = round(n_samples / sr / dt, 1)
    # Dispatch-amortized fold RTF (how a busy server runs: utterances decode
    # back-to-back). 4 async dispatches of the SAME compiled program enqueue
    # on the device stream; one readback at the end — dispatch overlaps
    # compute, so wall/4 is the per-utterance device cost. Round-5 fold
    # sweep: target=5500 is the knee (237x wall vs 206x at the reference-
    # derived 11000); the ~34 ms tunnel dispatch is about half the
    # single-call wall here, which this amortization removes.
    def wr_gen_burst():
        vals = [wr_gen_j(wp, mel, jax.random.PRNGKey(10 + i))
                for i in range(4)]
        return sum(float(v) for v in vals)

    dtc = timeit(wr_gen_burst, n=2) / 4.0
    out["wavernn_fold_rtf_amortized"] = round(n_samples / sr / dtc, 1)

    # --- config 5: multi-speaker cloning (external d-vector) -----------------
    msmodel = setup_model(len(symbols), 10, Config(audio=acfg, model=ModelConfig()),
                          speaker_embedding_dim=256)
    msvars = msmodel.init(jax.random.PRNGKey(0))
    dvec = jnp.asarray(rng.standard_normal((1, 256)), jnp.float32)
    text1 = jnp.asarray(rng.integers(1, len(symbols), (1, 64)), jnp.int32)
    lens1 = jnp.full((1,), 64, jnp.int32)

    @jax.jit
    def clone(v, t, l, d):
        o = msmodel.inference(v, t, l, speaker_embeddings=d,
                              max_decoder_steps=steps)
        return jnp.abs(o["postnet_outputs"]).sum()

    dt = timeit(lambda *a: float(clone(*a)), msvars, text1, lens1, dvec)
    out["cloning_p50_ms"] = round(dt * 1000.0, 1)

    # --- ParallelTTS (round-4 non-autoregressive family) --------------------
    # train MFU at B=384 (chained, like the autoregressive series) and
    # batched serving RTF at the headline shape. Round-4 measurements:
    # train MFU 0.355/0.402/0.415 at B=128/384/768 (vs 0.18 autoregressive
    # knee); serving 10,882x RT at B=384 x 500 frames.
    try:
        from your_voice_tts_tpu.models.parallel_tts import (
            ParallelTTSLoss, uniform_durations)
        from your_voice_tts_tpu.nn.core import cast_f32_to_bf16
        from your_voice_tts_tpu.ops import dsp as _dsp
        from your_voice_tts_tpu.ops.filters import hann_window as _hw

        pcfg = Config(audio=acfg, model=ModelConfig(model="ParallelTTS", r=1),
                      training=TrainingConfig(mixed_precision=True))
        pmodel = setup_model(len(symbols), 0, pcfg)
        pvars = pmodel.init(jax.random.PRNGKey(0))
        p_criterion = ParallelTTSLoss()
        p_opt = build_optimizer(pcfg.training)
        p_opt_state = p_opt.init(pvars["params"])
        Bp, Ttp, Tmp = 384, 128, 400
        tlp = jnp.full((Bp,), Ttp, jnp.int32)
        mlp = jnp.full((Bp,), Tmp, jnp.int32)
        pbatch = {
            "text": jnp.asarray(rng.integers(1, len(symbols), (Bp, Ttp)),
                                jnp.int32),
            "text_lengths": tlp,
            "mel": jnp.asarray(rng.standard_normal((Bp, Tmp, 80)),
                               jnp.bfloat16),
            "durations": uniform_durations(tlp, mlp, Ttp),
        }

        def p_loss(params, state, batch, key):
            p = cast_f32_to_bf16(params)
            o = pmodel.forward({"params": p, "state": state}, batch["text"],
                               batch["text_lengths"], batch["durations"],
                               rng=key, train=True, max_frames=Tmp)
            o = jax.tree_util.tree_map(
                lambda a: a.astype(jnp.float32)
                if hasattr(a, "dtype") and a.dtype == jnp.bfloat16 else a, o)
            total, _ = p_criterion(o, batch["mel"].astype(jnp.float32),
                                   batch["durations"],
                                   batch["text_lengths"])
            return total

        @jax.jit
        def p_step(params, state, opt_state, batch, key):
            loss, grads = jax.value_and_grad(p_loss)(params, state, batch,
                                                     key)
            updates, opt_state = p_opt.update(grads, opt_state, params)
            params = jax.tree_util.tree_map(lambda p, u: p + u, params,
                                            updates)
            return params, opt_state, loss

        pp0, pst = pvars["params"], pvars["state"]
        ppc, poc, pl = p_step(pp0, pst, p_opt_state, pbatch,
                              jax.random.PRNGKey(0))
        float(pl)  # compile + warm
        Np = 6
        t0 = time.time()
        ppc, poc = pp0, p_opt_state
        for i in range(Np):
            ppc, poc, pl = p_step(ppc, pst, poc, pbatch,
                                  jax.random.PRNGKey(i))
        float(pl)
        dtp = (time.time() - t0) / Np
        out["parallel_train_step_ms_b384_chained"] = round(dtp * 1000.0, 1)
        out["parallel_train_frames_per_s_b384"] = round(Bp * Tmp / dtp, 0)
        compiled = p_step.lower(pp0, pst, p_opt_state, pbatch,
                                jax.random.PRNGKey(0)).compile()
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops = float(ca.get("flops", 0.0))
        if flops > 0:
            out["parallel_train_mfu_b384"] = round(
                flops / dtp / (_peak_bf16_tflops(
                    jax.devices()[0].device_kind) * 1e12), 4)

        # batched serving at the headline shape (B=384 x 500 frames + GL)
        from your_voice_tts_tpu.audio import AudioProcessor as _AP

        _ap = _AP(acfg)
        Mserve = 500
        stext = jnp.asarray(rng.integers(1, len(symbols), (Bp, Ttp)),
                            jnp.int32)
        window = jnp.asarray(_hw(acfg.win_length, acfg.fft_size),
                             jnp.float32)
        inv_basis = jnp.asarray(_ap.inv_mel_basis)

        @jax.jit
        def p_synth(variables, text, lens, key):
            o = pmodel.inference(variables, text, lens,
                                 max_decoder_steps=Mserve)
            wav = _dsp.inv_melspectrogram_batch(
                o["postnet_outputs"], key, mel_inv_basis=inv_basis,
                window=window, n_fft=acfg.fft_size, hop=acfg.hop_length,
                preemph=acfg.preemphasis, ref_level_db=acfg.ref_level_db,
                min_level_db=acfg.min_level_db, spec_gain=acfg.spec_gain,
                max_norm=acfg.max_norm, symmetric=acfg.symmetric_norm,
                clip=acfg.clip_norm, power=acfg.power,
                gl_iters=acfg.griffin_lim_iters,
                gl_momentum=acfg.griffin_lim_momentum)
            return jnp.abs(wav).sum()

        dts = timeit(lambda *a: float(p_synth(*a)), pvars, stext, tlp,
                     jax.random.PRNGKey(1))
        out["parallel_serving_rtf_b384"] = round(
            Bp * Mserve * acfg.hop_length / sr / dts, 1)
    except Exception as e:
        out["parallel_error"] = _short_err(e)

    # --- MelGAN at the HEADLINE shapes (VERDICT r4 next #1) -----------------
    # Every 10,000x-class number above is Griffin-Lim; BASELINE config #2
    # names batched MelGAN. This block measures the NEURAL-vocoder story at
    # B=384 x 500 frames: standalone mel->wav, behind the Tacotron2 bf16
    # decode, and behind ParallelTTS. bf16 conv stack (measured rel err
    # 0.0078 on the tanh waveform vs f32; wall 356 vs 442 ms standalone).
    # Round-5 stage profile: the two low-channel tail stages (ch 64/32 at
    # T=64k/128k) are ~half the wall at ~16% MXU — the known TPU cost of
    # MelGAN's channel-halving pyramid; stages 1-2 run at ~37%.
    try:
        from your_voice_tts_tpu.nn.core import cast_f32_to_bf16 as _cast16

        gpb = _cast16(gp)
        Bm, Tm_serve = 384, 500
        mel_big = jnp.asarray(
            rng.standard_normal((Bm, Tm_serve, 80)) * 0.3, jnp.bfloat16)

        @jax.jit
        def melgan_only(gp_, m):
            return jnp.abs(gen(gp_, m)).sum()

        dtm = timeit(lambda: float(melgan_only(gpb, mel_big)), n=3)
        audio_s_m = Bm * Tm_serve * acfg.hop_length / sr
        out["melgan_b384_rtf"] = round(audio_s_m / dtm, 1)

        t384 = jnp.asarray(rng.integers(1, len(symbols), (Bm, T_text)),
                           jnp.int32)
        l384 = jnp.full((Bm,), T_text, jnp.int32)

        @jax.jit
        def taco_melgan_384(variables, gp_, text, lens):
            o = model.inference(variables, text, lens,
                                max_decoder_steps=Tm_serve // model.r,
                                compute_dtype=jnp.bfloat16)
            wav = gen(gp_, o["postnet_outputs"].astype(jnp.bfloat16))
            return jnp.abs(wav).sum()

        dt2 = timeit(lambda *a: float(taco_melgan_384(*a)), variables, gpb,
                     t384, l384, n=3)
        out["taco2_melgan_b384_rtf"] = round(audio_s_m / dt2, 1)

        @jax.jit
        def par_melgan_384(pv, gp_, text, lens):
            o = pmodel.inference(pv, text, lens, max_decoder_steps=Tm_serve)
            wav = gen(gp_, o["postnet_outputs"].astype(jnp.bfloat16))
            return jnp.abs(wav).sum()

        dt3 = timeit(lambda *a: float(par_melgan_384(*a)), pvars, gpb,
                     stext, tlp, n=3)
        out["parallel_melgan_b384_rtf"] = round(audio_s_m / dt3, 1)
    except Exception as e:
        out["melgan_headline_error"] = _short_err(e)
    return out


def verify_gates(quick: bool = False) -> dict:
    """On-DEVICE numerics gates (VERDICT r1 weak #7: Pallas kernels were only
    interpret-mode verified inside the suite; this makes the real-Mosaic/bf16
    behavior falsifiable). Each gate returns its measured value + pass bool;
    the caller exits nonzero if any gate fails.

    Run: python bench.py --verify [--quick]
    `--quick` shrinks the GL gate shapes/iterations (<=2 min warm with the
    persistent compile cache); full mode keeps the production shapes.
    """
    import jax
    import jax.numpy as jnp

    from oracle import audio_ref
    from your_voice_tts_tpu.config import AudioConfig, Config, ModelConfig
    from your_voice_tts_tpu.models import setup_model
    from your_voice_tts_tpu.ops import dsp
    from your_voice_tts_tpu.ops.filters import hann_window
    from your_voice_tts_tpu.text import symbols

    class _ProgressDict(dict):
        """Gate results land one by one over minutes of remote-TPU compile +
        dispatch; narrate each to stderr (stdout stays the one JSON line)."""

        _n = 0

        def __setitem__(self, key, val):
            super().__setitem__(key, val)
            type(self)._n += 1
            desc = (f"value={val.get('value')} limit={val.get('limit')} "
                    f"ok={val.get('ok')}" if isinstance(val, dict)
                    else repr(val))
            print(f"[verify {type(self)._n}] {key}: {desc}",
                  file=sys.stderr, flush=True)

    gates = _ProgressDict()
    acfg = AudioConfig()
    rng = np.random.default_rng(0)

    # -- gate 1: mel parity vs the CPU numpy oracle, on device ---------------
    sr = acfg.sample_rate
    T = 64 if quick else 200  # frames for the GL gate; signal must cover them
    t = np.arange(acfg.hop_length * (T + 5)) / sr
    wav = (0.5 * np.sin(2 * np.pi * 440 * t)
           + 0.2 * np.sin(2 * np.pi * 1313 * t)
           + 0.05 * rng.standard_normal(t.shape)).astype(np.float32)
    from your_voice_tts_tpu.audio import AudioProcessor

    ap = AudioProcessor(acfg)
    mel_dev = np.asarray(ap.melspectrogram(wav))
    # AudioProcessorRef defaults == AudioConfig defaults (oracle/audio_ref.py)
    mel_ref = audio_ref.AudioProcessorRef().melspectrogram(wav)
    d = float(np.abs(mel_dev - mel_ref).max())
    gates["mel_parity_maxdiff"] = {"value": round(d, 6), "limit": 2e-3,
                                   "ok": d <= 2e-3}

    # -- gate 2: GL reconstruction through the production Pallas route -------
    n_fft, hop = acfg.fft_size, acfg.hop_length
    w = jnp.asarray(hann_window(acfg.win_length, n_fft), jnp.float32)
    wav2 = np.stack([wav[: hop * (T + 3)],
                     wav[hop: hop * (T + 4)]]).astype(np.float32)
    L = jnp.int32(wav2.shape[1])
    S = jnp.abs(jax.vmap(lambda y: dsp.stft(y, L, n_fft, hop, w))(
        jnp.asarray(wav2)))[:, :T]
    use_pallas = jax.default_backend() == "tpu"
    gl_iters = 12 if quick else acfg.griffin_lim_iters
    y = dsp.griffin_lim_batch(S, jax.random.PRNGKey(0),
                              n_iters=gl_iters,
                              n_fft=n_fft, hop=hop, window=w,
                              use_pallas=use_pallas,
                              momentum=acfg.griffin_lim_momentum)
    L2 = jnp.int32(y.shape[1])
    S2 = jnp.abs(jax.vmap(lambda v: dsp.stft(v, L2, n_fft, hop, w))(y))[:, :T]
    err = float(jnp.linalg.norm(S2 - S) / jnp.linalg.norm(S))
    gl_limit = 0.35 if quick else 0.25  # fewer FGLA iters converge less far
    gates["gl_reconstruction_err"] = {"value": round(err, 4), "limit": gl_limit,
                                      "ok": err <= gl_limit,
                                      "pallas": bool(use_pallas)}

    # -- gate 3: WaveRNN kernel vs XLA scan, greedy, on device ---------------
    # (off-TPU the kernel runs in Pallas interpret mode, like gates 5-9,
    # so the whole verify suite is executable on any backend)
    import contextlib

    from jax.experimental.pallas import tpu as pltpu

    from your_voice_tts_tpu.ops.pallas.wavernn_gen import wavernn_generate_pallas
    from your_voice_tts_tpu.vocoder.models.wavernn import WaveRNN

    def interp():
        return (pltpu.force_tpu_interpret_mode()
                if jax.default_backend() != "tpu" else contextlib.nullcontext())

    wr = WaveRNN(n_mels=20, bits=8, rnn_dims=64, fc_dims=64, compute_dims=32,
                 res_out_dims=32, num_res_blocks=2, pad=2,
                 upsample_factors=(4, 4, 4))
    pwr = wr.init(jax.random.PRNGKey(0))
    mel = jnp.asarray(rng.standard_normal((24, 20)), jnp.float32)
    cond, aux = wr.upsample(pwr["upsample"], mel[None])
    with interp():
        out_k = np.asarray(wavernn_generate_pallas(pwr, cond, aux, seed=0,
                                                   bits=8, chunk=128,
                                                   greedy=True))
    out_s = np.asarray(wr.generate_fold(pwr, cond, aux, jax.random.PRNGKey(2),
                                        greedy=True))
    # greedy argmax can flip on device-specific rounding and diverge after;
    # gate on the fraction of exactly-matching samples
    match = float((np.abs(out_k - out_s) < 1e-3).mean())
    gates["wavernn_kernel_greedy_match"] = {"value": round(match, 4),
                                            "limit": 0.9, "ok": match >= 0.9}

    # -- gate 4: bf16 decoder parity vs f32, on device ------------------------
    mcfg = ModelConfig(r=2, max_decoder_steps=40, embedding_dim=64,
                       encoder_dim=64, decoder_rnn_dim=64, attention_rnn_dim=64,
                       attention_dim=32, attention_location_filters=8,
                       attention_location_kernel_size=15, prenet_dim=32,
                       postnet_dim=64)
    model = setup_model(len(symbols), 0, Config(audio=acfg, model=mcfg))
    variables = model.init(jax.random.PRNGKey(0))
    text = jnp.asarray(rng.integers(1, len(symbols), (2, 24)), jnp.int32)
    lens = jnp.asarray([24, 16], jnp.int32)
    f32 = np.asarray(model.inference(variables, text, lens,
                                     use_pallas=False)["postnet_outputs"])
    b16 = np.asarray(model.inference(variables, text, lens,
                                     compute_dtype=jnp.bfloat16,
                                     use_pallas=False)["postnet_outputs"])
    rel = float(np.abs(f32 - b16).max() / max(float(np.abs(f32).max()), 1e-3))
    gates["bf16_decoder_rel_err"] = {"value": round(rel, 4), "limit": 0.08,
                                     "ok": rel <= 0.08}

    # -- gate 5: Pallas decode kernel vs XLA scan, on device ------------------
    # dropout off so the two paths are deterministic and comparable; the
    # kernel computes in bf16, so gate at the bf16 parity budget
    import dataclasses

    mcfg5 = dataclasses.replace(mcfg, prenet_dropout=False)
    model5 = setup_model(len(symbols), 0, Config(audio=acfg, model=mcfg5))
    var5 = model5.init(jax.random.PRNGKey(0))
    scan = np.asarray(model5.inference(var5, text, lens,
                                       use_pallas=False)["postnet_outputs"])
    with interp():
        pal = np.asarray(model5.inference(var5, text, lens,
                                          use_pallas=True)["postnet_outputs"])
    rel5 = float(np.abs(scan - pal).max() / max(float(np.abs(scan).max()), 1e-3))
    gates["taco2_decode_kernel_rel_err"] = {"value": round(rel5, 4),
                                            "limit": 0.08, "ok": rel5 <= 0.08}

    # -- gate 6: Tacotron(1) decode kernel vs XLA scan, on device -------------
    mcfg6 = dataclasses.replace(mcfg5, model="Tacotron", tacotron_width=128,
                                memory_size=5)
    model6 = setup_model(len(symbols), 0, Config(audio=acfg, model=mcfg6))
    var6 = model6.init(jax.random.PRNGKey(0))
    scan6 = np.asarray(model6.inference(var6, text, lens,
                                        use_pallas=False)["decoder_outputs"])
    with interp():
        pal6 = np.asarray(model6.inference(var6, text, lens,
                                           use_pallas=True)["decoder_outputs"])
    rel6 = float(np.abs(scan6 - pal6).max()
                 / max(float(np.abs(scan6).max()), 1e-3))
    gates["taco1_decode_kernel_rel_err"] = {"value": round(rel6, 4),
                                            "limit": 0.08, "ok": rel6 <= 0.08}

    # -- gate 7: Graves GMM attention in-kernel vs XLA scan, on device --------
    # (round-3: last attention config moved in-kernel; per-component VPU
    # mixture math + VMEM-carried means must track the scan within bf16)
    mcfg7 = dataclasses.replace(mcfg5, attention_type="graves")
    model7 = setup_model(len(symbols), 0, Config(audio=acfg, model=mcfg7))
    var7 = model7.init(jax.random.PRNGKey(0))
    scan7 = np.asarray(model7.inference(var7, text, lens,
                                        use_pallas=False)["postnet_outputs"])
    with interp():
        pal7 = np.asarray(model7.inference(var7, text, lens,
                                           use_pallas=True)["postnet_outputs"])
    rel7 = float(np.abs(scan7 - pal7).max()
                 / max(float(np.abs(scan7).max()), 1e-3))
    gates["taco2_graves_kernel_rel_err"] = {"value": round(rel7, 4),
                                            "limit": 0.08, "ok": rel7 <= 0.08}

    # -- gate 8: tiled location attention (T > MAX_T_BANDED) vs scan ----------
    # (round-3: texts past the banded cap auto-route onto the constant-VMEM
    # tile formulation — taco2_decode._tile_matrices — instead of the scan;
    # T=300 pads to 384 internally, exercising 3 tiles + halo slabs + T-pad)
    text8 = jnp.asarray(rng.integers(1, len(symbols), (2, 300)), jnp.int32)
    lens8 = jnp.asarray([300, 220], jnp.int32)
    scan8 = np.asarray(model5.inference(var5, text8, lens8,
                                        use_pallas=False)["postnet_outputs"])
    with interp():
        pal8 = np.asarray(model5.inference(var5, text8, lens8,
                                           use_pallas=True)["postnet_outputs"])
    rel8 = float(np.abs(scan8 - pal8).max()
                 / max(float(np.abs(scan8).max()), 1e-3))
    gates["taco2_tiled_kernel_rel_err"] = {"value": round(rel8, 4),
                                           "limit": 0.08, "ok": rel8 <= 0.08}

    # -- gate 9: Tacotron(1) tiled location attention vs scan -----------------
    # (taco1 port of the tile formulation: its T cap lifts like taco2's)
    scan9 = np.asarray(model6.inference(var6, text8, lens8,
                                        use_pallas=False)["decoder_outputs"])
    with interp():
        pal9 = np.asarray(model6.inference(var6, text8, lens8,
                                           use_pallas=True)["decoder_outputs"])
    rel9 = float(np.abs(scan9 - pal9).max()
                 / max(float(np.abs(scan9).max()), 1e-3))
    gates["taco1_tiled_kernel_rel_err"] = {"value": round(rel9, 4),
                                           "limit": 0.08, "ok": rel9 <= 0.08}

    # -- gate 10: AOT serving artifact reproduces the live program ------------
    # (round-3 export subsystem: lower + serialize + reload through
    # jax.export ON THIS BACKEND and compare the artifact's audio against
    # the live jitted serve fn — text ids in, waveform out)
    import tempfile

    from your_voice_tts_tpu.infer.export import (ExportedSynthesizer,
                                                 export_serving,
                                                 make_serving_fn)

    acfg10 = dataclasses.replace(acfg, griffin_lim_iters=8)
    cfg10 = Config(audio=acfg10, model=mcfg5)
    ap10 = AudioProcessor(acfg10)
    with tempfile.TemporaryDirectory() as td:
        export_serving(model5, var5, cfg10, ap10, td,
                       batch_sizes=(int(text.shape[0]),),
                       text_buckets=(int(text.shape[1]),),
                       platforms=(jax.default_backend(),))
        served = ExportedSynthesizer(td)
        live = jax.jit(make_serving_fn(model5, var5, cfg10, ap10))
        wav_live, len_live = live(text, lens, jax.random.PRNGKey(0))
        wav_exp, len_exp = served(np.asarray(text), np.asarray(lens), seed=0)
    d10 = float(np.abs(np.asarray(wav_live) - wav_exp).max())
    ok10 = d10 <= 1e-4 and bool(
        (np.asarray(len_live) == len_exp).all())
    gates["export_artifact_maxdiff"] = {"value": round(d10, 6),
                                       "limit": 1e-4, "ok": ok10}

    # -- gate 11: Pallas-kernel serving artifact executes on the real TPU -----
    # (session-4b exported these from a CPU-only host; Mosaic lowering +
    # serialization were gated there but EXECUTION needs a chip. On TPU this
    # runs the baked-in decode + Griffin-Lim kernels from the artifact and
    # compares against the live jitted Pallas route; off-TPU it degrades to
    # the lowering/serialize/reload check the suite already covers.)
    if jax.default_backend() == "tpu":
        with tempfile.TemporaryDirectory() as td:
            export_serving(model5, var5, cfg10, ap10, td,
                           batch_sizes=(int(text.shape[0]),),
                           text_buckets=(int(text.shape[1]),),
                           platforms=("tpu",), use_pallas=True)
            served = ExportedSynthesizer(td)
            live = jax.jit(make_serving_fn(model5, var5, cfg10, ap10,
                                           use_pallas=True))
            wav_live, len_live = live(text, lens, jax.random.PRNGKey(0))
            wav_exp, len_exp = served(np.asarray(text), np.asarray(lens),
                                      seed=0)
        d11 = float(np.abs(np.asarray(wav_live) - wav_exp).max())
        ok11 = d11 <= 1e-4 and bool(
            (np.asarray(len_live) == len_exp).all())
        gates["pallas_artifact_maxdiff"] = {"value": round(d11, 6),
                                            "limit": 1e-4, "ok": ok11}
    else:
        with tempfile.TemporaryDirectory() as td:
            export_serving(model5, var5, cfg10, ap10, td,
                           batch_sizes=(int(text.shape[0]),),
                           text_buckets=(int(text.shape[1]),),
                           platforms=("tpu",), use_pallas=True)
            shapes = ExportedSynthesizer(td).shapes()
        okl = shapes == [(int(text.shape[0]), int(text.shape[1]))]
        gates["pallas_artifact_maxdiff"] = {"value": 0.0, "limit": 1e-4,
                                            "ok": okl,
                                            "lowering_only": True}

    # -- gate 12: Pallas TRAINING kernels vs the XLA custom-VJP scan ----------
    # (round-3: the teacher-forced fwd/bwd decode kernels in
    # ops/pallas/taco2_train.py; full input+weight gradients must track the
    # scan path within the bf16 parity budget. On TPU this exercises the
    # real Mosaic lowering of BOTH kernels; off-TPU it runs interpret mode.)
    from your_voice_tts_tpu.models.common import sequence_mask
    from your_voice_tts_tpu.models.decoder_grad import make_scan_core
    from your_voice_tts_tpu.models.tacotron2 import Decoder

    cfg12 = ModelConfig(r=2, prenet_dim=32, attention_rnn_dim=64,
                        decoder_rnn_dim=64, attention_dim=32,
                        attention_location_filters=8,
                        attention_location_kernel_size=15,
                        attention_norm="sigmoid", separate_stopnet=False)
    dec12 = Decoder(64, 80, 2, cfg12)
    p12 = dec12.init(jax.random.PRNGKey(0))
    p12 = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), p12)
    B12, Tm12, Ti12 = 4, 20, 24
    rng12 = np.random.default_rng(5)
    mels12 = jnp.asarray(rng12.normal(size=(B12, Tm12, 80)), jnp.bfloat16)
    enc12 = jnp.asarray(rng12.normal(size=(B12, Ti12, 64)), jnp.bfloat16)
    lens12 = jnp.asarray([Ti12, Ti12 - 3, Ti12 - 7, 12], jnp.int32)
    maskf12 = sequence_mask(lens12, Ti12).astype(jnp.float32)
    proc12 = dec12.attention.preprocess_inputs(p12["attention"], enc12)
    go12 = jnp.zeros((B12, 1, 80), jnp.bfloat16)
    pren12, _ = dec12.prenet(p12["prenet"], {},
                             jnp.concatenate([go12, mels12[:, 1::2][:, :-1]],
                                             1),
                             jax.random.PRNGKey(11), True)
    pren_t12 = jnp.swapaxes(pren12, 0, 1)
    keys12 = jnp.zeros((Tm12 // 2, 2), jnp.uint32)
    p_core12 = {"attention_rnn": p12["attention_rnn"],
                "decoder_rnn": p12["decoder_rnn"],
                "attention": p12["attention"]}

    def grads12(kernel: bool):
        dec12.train_kernel = kernel
        dec12.train_kernel_interpret = (kernel
                                        and jax.default_backend() != "tpu")
        core = make_scan_core(dec12, use_dropout=False)

        def loss(p_core, pren_t, enc, proc):
            dh, cx, al = core(p_core, pren_t, enc, proc, maskf12, keys12)
            return (jnp.sum(dh.astype(jnp.float32) ** 2)
                    + 0.7 * jnp.sum(cx.astype(jnp.float32) ** 2)
                    + 0.3 * jnp.sum(al ** 2))

        return jax.device_get(jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3)))(
            p_core12, pren_t12, enc12, proc12))

    g_k = jax.tree_util.tree_leaves(grads12(True))
    g_s = jax.tree_util.tree_leaves(grads12(False))
    gs12 = max(float(np.max(np.abs(np.asarray(x, np.float64)))) for x in g_s)
    rel12 = max(
        float(np.max(np.abs(np.asarray(a, np.float64)
                            - np.asarray(b, np.float64)))
              / max(float(np.max(np.abs(np.asarray(b, np.float64)))),
                    1e-2 * gs12))
        for a, b in zip(g_k, g_s))
    gates["taco2_train_kernel_grad_rel_err"] = {
        "value": round(rel12, 4), "limit": 0.08, "ok": rel12 <= 0.08}

    # -- gate 13: full-shape Mosaic COMPILE legality --------------------------
    # (round 3 shipped a Mosaic tpu.concatenate layout regression that 272
    # CPU tests + 12 quick on-device gates never saw: interpret-mode
    # equivalence does not cover Mosaic layout legality — only real
    # lowering/compile at real shapes does, and legality is SHAPE-dependent
    # (the hop=64 lane offset was illegal where hop=256 was fine). Each
    # entry compiles — on TPU — one driver-facing Pallas program at its
    # EXACT bench/serving shape; off-TPU it runs the host-side Mosaic
    # lowering via jax.export for the tpu platform. Compile-only: nothing
    # executes, abstract avals avoid materializing the big operands, and
    # the persistent compile cache makes warm re-runs cheap. These run in
    # BOTH --quick and full mode by design.)
    from jax import export as jexport

    from your_voice_tts_tpu.audio import AudioProcessor
    from your_voice_tts_tpu.config import load_config
    from your_voice_tts_tpu.infer.export import make_serving_fn as _msf
    from your_voice_tts_tpu.ops.pallas.griffin_lim import (
        griffin_lim_pallas_full, griffin_lim_pallas_wave)

    on_tpu = jax.default_backend() == "tpu"

    def _shape_gate(name: str, fn, *avals):
        try:
            if on_tpu:
                jax.jit(fn).lower(*avals).compile()
                val = "compiled"
            else:
                jexport.export(jax.jit(fn), platforms=("tpu",))(*avals)
                val = "tpu-lowered"
            gates[name] = {"value": val, "limit": "compiles", "ok": True}
        except Exception as e:
            gates[name] = {"value": _short_err(e, 140), "limit": "compiles",
                           "ok": False}

    import dataclasses as _dc

    here13 = os.path.dirname(os.path.abspath(__file__))
    aval = jax.ShapeDtypeStruct

    # 13a: headline GL wave kernel — B=448 x T=500, n_fft=1024/hop=256, the
    # exact mel->wav program behind the driver-recorded headline number
    acfg13 = AudioConfig()
    w13 = jnp.asarray(hann_window(acfg13.win_length, acfg13.fft_size),
                      jnp.float32)
    Kf13 = acfg13.fft_size // 2 + 1
    _shape_gate(
        "shape_gl_wave_b448_t500",
        lambda S: griffin_lim_pallas_wave(
            S, 0, n_iters=acfg13.griffin_lim_iters, n_fft=acfg13.fft_size,
            hop=acfg13.hop_length, window=w13,
            momentum=acfg13.griffin_lim_momentum),
        aval((448, 500, Kf13), jnp.float32))

    # 13b: lane-unaligned GL (smoke audio n_fft=256/hop=64) at the exact
    # Tp=224 shape that broke round 3, plus the serving max T=512
    w13s = jnp.asarray(hann_window(256, 256), jnp.float32)
    for tlen in (221, 512):
        _shape_gate(
            f"shape_gl_full_hop64_t{tlen}",
            lambda S: griffin_lim_pallas_full(
                S, 0, n_iters=15, n_fft=256, hop=64, window=w13s),
            aval((16, tlen, 129), jnp.float32))

    # 13c: weights-in-VMEM decode kernel at the batch-1 serving shape,
    # FULL production model dims (quick mode otherwise only compiles the
    # shrunken-dims kernel)
    mcfg13 = ModelConfig(r=2, max_decoder_steps=500)
    model13 = setup_model(len(symbols), 0,
                          Config(audio=acfg13, model=mcfg13))
    var13 = model13.init(jax.random.PRNGKey(0))
    _shape_gate(
        "shape_decode_kernel_b1_full_dims",
        lambda v, t, l: model13.inference(
            v, t, l, use_pallas=True)["postnet_outputs"],
        var13, aval((1, 80), jnp.int32), aval((1,), jnp.int32))

    # 13d: the WHOLE serving program (text ids -> wav) at the micro-batched
    # HTTP shape — smoke config, B=16 x 64 text, max_decoder_steps=256:
    # exactly what bench's serving section and the demo server compile
    cfg13d = load_config(os.path.join(here13, "configs",
                                      "smoke_synthetic.json"))
    cfg13d = _dc.replace(
        cfg13d, model=_dc.replace(cfg13d.model, max_decoder_steps=256))
    model13d = setup_model(len(symbols), 0, cfg13d)
    var13d = model13d.init(jax.random.PRNGKey(0))
    ap13d = AudioProcessor(cfg13d.audio)
    _shape_gate(
        "shape_serving_smoke_b16",
        _msf(model13d, var13d, cfg13d, ap13d, use_pallas=True),
        aval((16, 64), jnp.int32), aval((16,), jnp.int32),
        jax.random.PRNGKey(0))

    # 13e: teacher-forced TRAINING kernels (fwd+bwd) at the B=128 knee,
    # full production decoder dims, bf16 — the shapes the trainer ships
    cfg13t = ModelConfig(r=2, attention_norm="sigmoid",
                         separate_stopnet=False)
    dec13t = Decoder(512, 80, 2, cfg13t)
    p13t = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16), dec13t.init(jax.random.PRNGKey(0)))
    B13, Tm13, Ti13 = 128, 400, 128
    lens13 = jnp.full((B13,), Ti13, jnp.int32)
    maskf13 = sequence_mask(lens13, Ti13).astype(jnp.float32)
    keys13 = jnp.zeros((Tm13 // 2, 2), jnp.uint32)
    p_core13 = {"attention_rnn": p13t["attention_rnn"],
                "decoder_rnn": p13t["decoder_rnn"],
                "attention": p13t["attention"]}
    dec13t.train_kernel = True
    dec13t.train_kernel_interpret = False
    core13 = make_scan_core(dec13t, use_dropout=False)

    def loss13(p_core, pren_t, enc, proc):
        dh, cx, al = core13(p_core, pren_t, enc, proc, maskf13, keys13)
        return (jnp.sum(dh.astype(jnp.float32) ** 2)
                + jnp.sum(cx.astype(jnp.float32) ** 2) + jnp.sum(al ** 2))

    _shape_gate(
        "shape_train_kernels_b128_full_dims",
        jax.grad(loss13, argnums=(0, 1, 2, 3)),
        p_core13,
        aval((Tm13 // 2, B13, 256), jnp.bfloat16),    # prenet out, time-major
        aval((B13, Ti13, 512), jnp.bfloat16),          # encoder memory
        aval((B13, Ti13, 128), jnp.float32))           # processed inputs

    return gates


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true", help="small shapes (CI smoke)")
    p.add_argument("--verify", action="store_true",
                   help="run on-device numerics gates and exit")
    p.add_argument("--batch", type=int, default=None)
    p.add_argument("--steps", type=int, default=None, help="decoder steps")
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--no-trained", action="store_true",
                   help="skip the trained-checkpoint latency block")
    p.add_argument("--split", action="store_true",
                   help="also time decode-only and GL-only at the headline "
                        "batch (attributes the batch wall to its two "
                        "components; costs two extra compiles)")
    args = p.parse_args()

    # Contention marker: run_tests.sh's fast-tier wall budget is load-aware
    # (VERDICT r4 weak #5 — the fixed 900 s ceiling tripped with all tests
    # green under concurrent TPU benching). While any bench/verify runs,
    # .bench_lock holds our PID; the test runner doubles its budget when it
    # sees a live one at the start OR end of its run.
    _lock = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".bench_lock")
    try:
        with open(_lock, "w") as f:
            f.write(str(os.getpid()))
        atexit.register(lambda: os.path.exists(_lock) and os.unlink(_lock))
    except OSError:
        pass

    err = _probe_backend()
    if err is not None:
        # value 0 + error field: recorded and explained, never mistaken
        # for a performance claim
        print(json.dumps({"metric": "e2e_synthesis_realtime_factor",
                          "value": 0.0, "unit": "x_realtime_per_chip",
                          "vs_baseline": 0.0, "error": err}))
        sys.exit(0 if not args.verify else 1)

    _setup_compile_cache()

    if args.verify:
        import jax

        gates = verify_gates(quick=args.quick)
        ok = all(g["ok"] for g in gates.values())
        print(json.dumps({"verify": gates, "ok": ok, "quick": args.quick,
                          "backend": jax.default_backend()}))
        sys.exit(0 if ok else 1)

    import jax
    import jax.numpy as jnp

    watchdog = _Watchdog()

    from your_voice_tts_tpu.audio import AudioProcessor
    from your_voice_tts_tpu.config import AudioConfig, Config, ModelConfig
    from your_voice_tts_tpu.models import setup_model
    from your_voice_tts_tpu.ops import dsp
    from your_voice_tts_tpu.ops.filters import hann_window
    from your_voice_tts_tpu.text import symbols, text_to_sequence

    backend = jax.default_backend()
    quick = args.quick
    # Headline batch/dtype: the serving knee, re-measured each round.
    # Round-3 sweep (f32 scan past the kernel's B<=128 VMEM cap): 128
    # kernel 5986x -> 256 6262x -> 384 6998x -> 512 7021x; bf16 at 384 was
    # a wash then (GL dominated the wall). Round 4, with the packed+fused-
    # istft GL kernel shrinking the GL share: B=384 f32 10,120x / bf16
    # 10,117x; B=448 f32 9,713x / bf16 10,420x (stable across 3 runs);
    # B=512 f32 9,086x. The decode share is now big enough that bf16 pays
    # at 448 — new default B=448 + bf16 decode (numerics gated by
    # bf16_decoder_rel_err and the kernel parity gates).
    B = args.batch or (4 if quick else 448)
    headline_dtype = None if quick else jnp.bfloat16
    max_steps = args.steps or (20 if quick else 250)
    r = 2

    acfg = AudioConfig()  # LJSpeech-style 22.05 kHz, 80 mels, hop 256
    mcfg = ModelConfig(r=r, max_decoder_steps=max_steps) if not quick else \
        ModelConfig(r=r, max_decoder_steps=max_steps, embedding_dim=64,
                    encoder_dim=64, decoder_rnn_dim=64, attention_rnn_dim=64,
                    attention_dim=32, attention_location_filters=8,
                    attention_location_kernel_size=15, prenet_dim=32,
                    postnet_dim=64)
    cfg = Config(audio=acfg, model=mcfg)
    model = setup_model(len(symbols), 0, cfg)
    variables = model.init(jax.random.PRNGKey(0))
    ap = AudioProcessor(acfg)

    # batch of realistic sentences (LJSpeech-like lengths)
    base_sentences = [
        "The quick brown fox jumps over the lazy dog near the river bank.",
        "Speech synthesis on tensor processing units is remarkably fast.",
        "Printing, in the only sense with which we are at present concerned.",
        "A quarter of a century has passed since the first edition appeared.",
    ]
    seqs = [text_to_sequence(s) for s in (base_sentences * ((B + 3) // 4))[:B]]
    T_text = max(len(s) for s in seqs)
    T_text = ((T_text + 15) // 16) * 16
    text = np.zeros((B, T_text), np.int32)
    lens = np.zeros((B,), np.int32)
    for i, s in enumerate(seqs):
        text[i, : len(s)] = s
        lens[i] = len(s)
    text = jnp.asarray(text)
    lens = jnp.asarray(lens)

    n_frames = max_steps * r
    window = jnp.asarray(hann_window(acfg.win_length, acfg.fft_size),
                         dtype=jnp.float32)
    inv_basis = jnp.asarray(ap.inv_mel_basis)

    @jax.jit
    def synthesize(variables, text, lens, key):
        out = model.inference(variables, text, lens, rng=None,
                              compute_dtype=headline_dtype)
        mel = out["postnet_outputs"]  # [B, T, n_mels]
        wav = dsp.inv_melspectrogram_batch(
            mel, key, mel_inv_basis=inv_basis, window=window,
            n_fft=acfg.fft_size, hop=acfg.hop_length, preemph=acfg.preemphasis,
            ref_level_db=acfg.ref_level_db, min_level_db=acfg.min_level_db,
            spec_gain=acfg.spec_gain, max_norm=acfg.max_norm,
            symmetric=acfg.symmetric_norm, clip=acfg.clip_norm,
            power=acfg.power, gl_iters=acfg.griffin_lim_iters,
            gl_momentum=acfg.griffin_lim_momentum)
        # reduce to a scalar INSIDE the program: timing converts it to a host
        # float, which cannot complete before the whole computation has run
        # (block_until_ready over the remote-TPU tunnel has been observed to
        # return early; a materialized data-dependent scalar cannot lie)
        return wav, out["mel_lengths"], jnp.abs(wav).sum()

    # compile
    watchdog.begin("headline", 2400)
    t0 = time.time()
    wav, _, chk = synthesize(variables, text, lens, jax.random.PRNGKey(0))
    float(chk)
    compile_time = time.time() - t0

    times = []
    for i in range(args.iters):
        t0 = time.time()
        wav, _, chk = synthesize(variables, text, lens, jax.random.PRNGKey(i + 1))
        float(chk)
        times.append(time.time() - t0)
    dt = min(times)

    audio_seconds = B * n_frames * acfg.hop_length / acfg.sample_rate
    rtf = audio_seconds / dt
    mel_frames_per_sec = B * n_frames / dt

    split_extras = {}
    if args.split:
        # attribute the batch wall: decode-only (text -> postnet mel) vs
        # GL-only (mel -> wav) on the SAME shapes as the headline
        @jax.jit
        def decode_only(variables, text, lens):
            out = model.inference(variables, text, lens, rng=None,
                                  compute_dtype=headline_dtype)
            mel = out["postnet_outputs"]
            return jnp.abs(mel).sum()

        @jax.jit
        def gl_only(mel, key):
            wav = dsp.inv_melspectrogram_batch(
                mel, key, mel_inv_basis=inv_basis, window=window,
                n_fft=acfg.fft_size, hop=acfg.hop_length,
                preemph=acfg.preemphasis, ref_level_db=acfg.ref_level_db,
                min_level_db=acfg.min_level_db, spec_gain=acfg.spec_gain,
                max_norm=acfg.max_norm, symmetric=acfg.symmetric_norm,
                clip=acfg.clip_norm, power=acfg.power,
                gl_iters=acfg.griffin_lim_iters,
                gl_momentum=acfg.griffin_lim_momentum)
            return jnp.abs(wav).sum()

        mel_fixed = jax.block_until_ready(
            model.inference(variables, text, lens, rng=None)
            ["postnet_outputs"])
        for name, fn, fargs in (
                ("decode_only", decode_only, (variables, text, lens)),
                ("gl_only", gl_only, (mel_fixed, jax.random.PRNGKey(0)))):
            float(fn(*fargs))  # compile
            tt = []
            for i in range(args.iters):
                t0 = time.time()
                float(fn(*fargs))
                tt.append(time.time() - t0)
            split_extras[f"{name}_wall_s"] = round(min(tt), 4)

    # p50 single-utterance latency (BASELINE.json metric), batch=1.
    # The headline number uses the serving default (auto-routes onto the
    # weights-in-VMEM Pallas decode kernel on TPU; bench --verify gate 5);
    # the scan-f32 / scan-bf16 numbers keep the historical comparison.
    def batch1_p50(dtype, use_pallas=None):
        @jax.jit
        def synth1(variables, text, lens, key):
            out = model.inference(variables, text, lens, rng=None,
                                  compute_dtype=dtype, use_pallas=use_pallas)
            mel = out["postnet_outputs"]
            wav = dsp.inv_melspectrogram_batch(
                mel, key, mel_inv_basis=inv_basis, window=window,
                n_fft=acfg.fft_size, hop=acfg.hop_length,
                preemph=acfg.preemphasis, ref_level_db=acfg.ref_level_db,
                min_level_db=acfg.min_level_db, spec_gain=acfg.spec_gain,
                max_norm=acfg.max_norm, symmetric=acfg.symmetric_norm,
                clip=acfg.clip_norm, power=acfg.power,
                gl_iters=acfg.griffin_lim_iters,
                gl_momentum=acfg.griffin_lim_momentum)
            return jnp.abs(wav).sum()

        text1, lens1 = text[:1], lens[:1]
        float(synth1(variables, text1, lens1, jax.random.PRNGKey(99)))
        lat = []
        for i in range(7):
            t0 = time.time()
            float(synth1(variables, text1, lens1, jax.random.PRNGKey(100 + i)))
            lat.append(time.time() - t0)
        return sorted(lat)[len(lat) // 2] * 1000.0

    p50_ms = batch1_p50(None)                            # serving default
    p50_scan_ms = batch1_p50(None, use_pallas=False)
    p50_bf16_ms = batch1_p50(jnp.bfloat16, use_pallas=False)

    watchdog.end("headline")
    result = {
        "metric": "batched end-to-end synthesis realtime factor per chip "
                  "(Tacotron2 decode + on-device Griffin-Lim, batch "
                  f"{B} x {n_frames} mel frames @ {acfg.sample_rate}Hz)",
        "value": round(rtf, 2),
        "unit": "x realtime",
        "vs_baseline": round(rtf / 100.0, 4),
        "extra": {
            "backend": backend,
            "mel_frames_per_sec_per_chip": round(mel_frames_per_sec, 1),
            "wall_s_per_batch": round(dt, 4),
            "compile_s": round(compile_time, 1),
            "audio_seconds_per_batch": round(audio_seconds, 2),
            "p50_single_utterance_ms": round(p50_ms, 1),
            "p50_single_utterance_scan_f32_ms": round(p50_scan_ms, 1),
            "p50_single_utterance_scan_bf16_ms": round(p50_bf16_ms, 1),
            "p50_single_utterance_rtf": round(
                n_frames * acfg.hop_length / acfg.sample_rate / (p50_ms / 1000), 1),
            "dispatch_roundtrip_ms": round(dispatch_roundtrip_ms(), 1),
            "quick": quick,
            **split_extras,
        },
    }
    watchdog.set_partial(result)
    if not args.no_trained:
        try:
            with watchdog.section("trained_latency", 1500):
                result["extra"].update(trained_latency_extras(quick))
        except Exception as e:  # never lose the headline number
            result["extra"]["trained_latency_error"] = _short_err(e)
    if not quick:
        # one number per remaining BASELINE.json config (2/3/4/5)
        try:
            with watchdog.section("capability_matrix", 1800):
                result["extra"].update(capability_matrix_extras())
        except Exception as e:
            result["extra"]["matrix_error"] = _short_err(e)
    # objective quality gates (MCD / stop F1 / cloning selectivity) on the
    # committed trained checkpoints
    try:
        with watchdog.section("quality", 1200):
            result["extra"].update(quality_extras(quick))
    except Exception as e:
        result["extra"]["quality_error"] = _short_err(e)
    if not quick:
        try:
            with watchdog.section("cloning", 1200):
                result["extra"].update(cloning_extras())
        except Exception as e:
            result["extra"]["cloning_error"] = _short_err(e)
        try:
            with watchdog.section("serving", 1500):
                result["extra"].update(serving_extras())
        except Exception as e:
            result["extra"]["serving_error"] = _short_err(e)
        try:
            with watchdog.section("gl_sweep", 900):
                result["extra"].update(gl_sweep_extras(B=B))
        except Exception as e:
            result["extra"]["gl_sweep_error"] = _short_err(e)
    _emit(result)


def _emit(result: dict) -> None:
    """Print the ONE JSON line and exit — nonzero when any section errored.

    Last-resort bounds: every string inside the line is sanitized/truncated
    (an unbounded error string cost round 3 its driver-recorded number) and
    the full line is capped well under the driver's tail-capture window by
    dropping the largest extras if ever necessary."""
    def clamp(v):
        if isinstance(v, str):
            s = _ANSI_RE.sub("", v)
            return s if len(s) <= 200 else s[:200]
        if isinstance(v, dict):
            return {k: clamp(x) for k, x in v.items()}
        if isinstance(v, (list, tuple)):
            return [clamp(x) for x in v]
        return v

    result = clamp(result)
    line = json.dumps(result)
    if len(line) > 6000 and isinstance(result.get("extra"), dict):
        extra = result["extra"]
        for k in sorted(extra, key=lambda k: -len(json.dumps(extra[k]))):
            del extra[k]
            extra["truncated"] = "extras dropped to fit the one-line budget"
            line = json.dumps(result)
            if len(line) <= 6000:
                break
    print(line, flush=True)
    errs = [k for k in result.get("extra", {}) if k.endswith("_error")]
    if "error" in result:
        errs.append("error")
    if errs:
        _note(f"exiting nonzero: sections errored: {', '.join(errs)}")
        sys.exit(2)
    sys.exit(0)


if __name__ == "__main__":
    main()
