"""AOT serving export: compile the end-to-end synthesis program to a
self-contained StableHLO artifact (jax.export).

The TPU-native deployment story the reference cannot offer: one serialized
file per (batch, text-bucket) shape holds the WHOLE serving computation —
embedding -> encoder -> decoder scan -> postnet -> denormalize -> mel-to-
linear -> accelerated Griffin-Lim -> inverse preemphasis — with the trained
weights baked in as constants. Serving needs jax + the artifact: no model
code, no checkpoint loading, no retracing; the artifact is versioned by
StableHLO's compatibility guarantees (~6 months forward) rather than by this
package's source.

Reference contrast: torch checkpoints (.pth.tar) require the exact model
source to unpickle and rebuild; SURVEY.md §3.3's synthesize.py path re-runs
Python per utterance. Here `bin/export_serving` emits artifacts and
`load_serving()` (or any StableHLO runner) executes them.

By default the exported program uses the XLA scan decode path (portable
across platforms); multi-platform export (cpu+tpu) is supported by
jax.export — lower once on any host, run on either device kind. With
use_pallas=True the artifact instead bakes in the Mosaic fast paths (the
weights-in-VMEM decode kernel + whole-loop Griffin-Lim kernel) — TPU-only,
serving at the live kernel route's speed, still exportable from any host.
"""

from __future__ import annotations

import json
import os

import numpy as np

MANIFEST_NAME = "manifest.json"


def make_serving_fn(model, variables, cfg, ap, *, max_decoder_steps=None,
                    vocoder=None, speaker_mode=None, style_frames=None,
                    use_pallas=False):
    """Build the pure e2e fn (text [B, T] i32, lengths [B] i32, [spk,]
    [style,] key) -> (wav [B, L] f32, mel_lengths [B] i32). Weights are
    closed over, so export bakes them into the artifact.

    vocoder: optional VocoderSynthesizer — its generator (MelGAN / PWGAN)
    replaces Griffin-Lim inside the artifact, weights baked in alongside the
    TTS model's. WaveRNN is excluded: its sample-serial generation belongs to
    the live Pallas route, not a portable artifact.

    speaker_mode: None (single voice) | "id" (spk is [B] int32 embedding-
    table ids) | "dvector" (spk is [B, D] float32 d-vectors — the cloning
    deployment: any voice the speaker encoder can embed, one artifact).

    style_frames: for GST models, adds a style-reference input
    [B, style_frames, n_mels] (a fixed-length mel window of the style
    audio; ExportedSynthesizer tiles/truncates host-side).

    use_pallas=True bakes the Pallas (Mosaic) fast paths into the artifact
    — the weights-in-VMEM decode kernel and the whole-loop Griffin-Lim
    kernel — producing a TPU-only artifact that serves at the live kernel
    route's speed. Mosaic lowering happens host-side, so these artifacts
    export from any machine. Default False keeps the artifact portable
    (pure StableHLO, runs on cpu and tpu).

    Tacotron1's linear head is inverted with inv_spectrogram_batch (no mel
    pinv); neural vocoders require a mel model."""
    import jax.numpy as jnp

    from ..ops import dsp
    from ..ops.filters import hann_window

    acfg = cfg.audio
    compute_dtype = (jnp.bfloat16 if getattr(
        cfg.model, "inference_compute_dtype", "float32") == "bfloat16"
        else None)
    is_linear = getattr(model, "output_type", "mel") == "linear"
    if speaker_mode not in (None, "id", "dvector"):
        raise ValueError(f"unknown speaker_mode {speaker_mode!r}")

    def infer(text, lengths, spk, style):
        kw = {}
        if speaker_mode == "id":
            kw["speaker_ids"] = spk
        elif speaker_mode == "dvector":
            kw["speaker_embeddings"] = spk
        if style_frames is not None:
            kw["style_mel"] = style
        return model.inference(variables, text, lengths, rng=None,
                               max_decoder_steps=max_decoder_steps,
                               compute_dtype=compute_dtype,
                               use_pallas=use_pallas, **kw)

    if vocoder is not None:
        if is_linear:
            raise NotImplementedError("neural vocoders take mel input")
        vkind = vocoder.cfg.model
        if vkind not in ("melgan", "pwgan"):
            raise NotImplementedError(
                f"export supports melgan/pwgan vocoders, not {vkind!r}")
        vmodel, vparams = vocoder.model, vocoder.params

        def wav_fn(spec, key):
            return (vmodel(vparams, spec, key=key) if vkind == "pwgan"
                    else vmodel(vparams, spec))
    else:
        window = jnp.asarray(hann_window(acfg.win_length, acfg.fft_size),
                             jnp.float32)
        inv_basis = jnp.asarray(ap.inv_mel_basis)
        gl_kw = dict(
            window=window, n_fft=acfg.fft_size, hop=acfg.hop_length,
            preemph=acfg.preemphasis, ref_level_db=acfg.ref_level_db,
            min_level_db=acfg.min_level_db, spec_gain=acfg.spec_gain,
            max_norm=acfg.max_norm, symmetric=acfg.symmetric_norm,
            clip=acfg.clip_norm, power=acfg.power,
            gl_iters=acfg.griffin_lim_iters,
            gl_momentum=acfg.griffin_lim_momentum,
            signal_norm=acfg.signal_norm, use_pallas=use_pallas,
            # every other inference stage is row-independent, so a shared
            # GL phase init makes each served request's audio a pure
            # function of (its inputs, seed) — identical bytes regardless
            # of which batchmates the micro-batcher packed alongside it
            batch_invariant=True)
        if is_linear:
            lstats = getattr(ap, "linear_stats", None)

            def wav_fn(spec, key):
                return dsp.inv_spectrogram_batch(
                    spec, key, stats=None if lstats is None else tuple(
                        jnp.asarray(s) for s in lstats), **gl_kw)
        else:
            mstats = getattr(ap, "mel_stats", None)

            def wav_fn(spec, key):
                return dsp.inv_melspectrogram_batch(
                    spec, key, mel_inv_basis=inv_basis,
                    stats=None if mstats is None else tuple(
                        jnp.asarray(s) for s in mstats), **gl_kw)

    # per-row tail mask: frames past a row's own stop (mel_lengths) are
    # replaced by NORMALIZED silence before the waveform stage. The decode
    # runs until EVERY row stops, so without this a row's post-stop frames
    # are computed garbage whose extent depends on its batchmates — GL's
    # overlap-add (and a vocoder's receptive field) would bleed it backward
    # into real audio, and the same request would render differently under
    # different micro-batch compositions. Fill values mirror
    # AudioProcessor._inverse's padding (normalized-silence-per-bin under
    # stats normalization).
    fill_stats = getattr(ap, "linear_stats" if is_linear else "mel_stats",
                         None)
    if acfg.signal_norm and fill_stats is not None:
        mean, std = fill_stats
        fill_row = ((acfg.min_level_db - np.asarray(mean)) /
                    np.maximum(np.asarray(std), 1e-8)).astype(np.float32)
    elif acfg.signal_norm:
        fill_row = np.float32(-acfg.max_norm if acfg.symmetric_norm else 0.0)
    else:
        fill_row = np.float32(acfg.min_level_db)

    def mask_tail(spec, mel_lengths):
        mask = jnp.arange(spec.shape[1])[None, :, None] < \
            mel_lengths[:, None, None]
        return jnp.where(mask, spec, jnp.asarray(fill_row, spec.dtype))

    has_spk = speaker_mode is not None
    has_style = style_frames is not None
    if has_spk and has_style:
        def serve(text, lengths, spk, style, key):
            out = infer(text, lengths, spk, style)
            spec = mask_tail(out["postnet_outputs"], out["mel_lengths"])
            return wav_fn(spec, key), out["mel_lengths"]
    elif has_spk:
        def serve(text, lengths, spk, key):
            out = infer(text, lengths, spk, None)
            spec = mask_tail(out["postnet_outputs"], out["mel_lengths"])
            return wav_fn(spec, key), out["mel_lengths"]
    elif has_style:
        def serve(text, lengths, style, key):
            out = infer(text, lengths, None, style)
            spec = mask_tail(out["postnet_outputs"], out["mel_lengths"])
            return wav_fn(spec, key), out["mel_lengths"]
    else:
        def serve(text, lengths, key):
            out = infer(text, lengths, None, None)
            spec = mask_tail(out["postnet_outputs"], out["mel_lengths"])
            return wav_fn(spec, key), out["mel_lengths"]

    return serve


def export_serving(model, variables, cfg, ap, out_dir: str, *,
                   batch_sizes=(1,), text_buckets=(128,),
                   max_decoder_steps=None, platforms=("cpu", "tpu"),
                   vocoder=None, speaker_mode=None, d_dim=None,
                   speakers=None, style_frames=None,
                   use_pallas=False) -> dict:
    """Export one artifact per (batch, text-bucket) shape into out_dir and
    write a manifest. Returns the manifest dict. With a vocoder
    (VocoderSynthesizer), its generator replaces Griffin-Lim in the
    artifact. speaker_mode "id"/"dvector" adds a speaker input (d_dim
    required for "dvector"); `speakers` (name -> id or name -> d-vector
    list) is recorded in the manifest so named speakers serve from the
    artifact directory alone. style_frames adds a GST style-reference mel
    input [B, style_frames, n_mels]. use_pallas=True bakes the Mosaic
    kernel fast paths in — TPU-only artifacts (platforms must be
    ("tpu",)); see make_serving_fn."""
    import jax
    from jax import export as jexport

    serve = make_serving_fn(model, variables, cfg, ap,
                            max_decoder_steps=max_decoder_steps,
                            vocoder=vocoder, speaker_mode=speaker_mode,
                            style_frames=style_frames, use_pallas=use_pallas)
    if speaker_mode == "dvector" and not d_dim:
        raise ValueError("speaker_mode='dvector' needs d_dim")
    if use_pallas and tuple(platforms) != ("tpu",):
        raise ValueError(
            "Pallas-kernel artifacts are TPU-only: pass platforms=('tpu',)")
    os.makedirs(out_dir, exist_ok=True)
    steps = max_decoder_steps or cfg.model.max_decoder_steps
    entries = []
    for B in batch_sizes:
        for T in text_buckets:
            args = [jax.ShapeDtypeStruct((B, T), np.int32),
                    jax.ShapeDtypeStruct((B,), np.int32)]
            if speaker_mode == "id":
                args.append(jax.ShapeDtypeStruct((B,), np.int32))
            elif speaker_mode == "dvector":
                args.append(jax.ShapeDtypeStruct((B, d_dim), np.float32))
            if style_frames is not None:
                args.append(jax.ShapeDtypeStruct(
                    (B, style_frames, cfg.audio.num_mels), np.float32))
            args.append(jax.ShapeDtypeStruct((2,), np.uint32))
            exp = jexport.export(jax.jit(serve),
                                 platforms=list(platforms))(*args)
            name = f"serve_b{B}_t{T}.stablehlo"
            with open(os.path.join(out_dir, name), "wb") as f:
                f.write(exp.serialize())
            entries.append({"file": name, "batch": B, "text_bucket": T})
    if vocoder is None:
        waveform, upsample = "griffin_lim", cfg.audio.hop_length
    else:
        waveform = vocoder.cfg.model
        vk = getattr(vocoder.cfg, waveform)
        upsample = 1
        for f in vk.upsample_factors:
            upsample *= f
    manifest = {
        "entries": entries,
        "platforms": list(platforms),
        "sample_rate": cfg.audio.sample_rate,
        "hop_length": cfg.audio.hop_length,
        # the ACTIVE reduction factor — checkpoint meta may have set a
        # different r than the config (gradual training / imports), and the
        # traced program decoded with the active one
        "r": getattr(model, "r", cfg.model.r),
        "max_decoder_steps": steps,
        "waveform": waveform,
        "samples_per_frame": upsample,
        "pallas": bool(use_pallas),
        "key_dtype": "uint32[2] (jax PRNG key data for stochastic phase)",
        "inputs": "text ids [B, T] int32 (zero-padded), lengths [B] int32"
                  + {"id": ", speaker ids [B] int32",
                     "dvector": f", d-vectors [B, {d_dim}] float32"}.get(
                         speaker_mode, "")
                  + (f", style mel [B, {style_frames}, "
                     f"{cfg.audio.num_mels}] float32"
                     if style_frames is not None else ""),
        "outputs": ("wav [B, steps*r*samples_per_frame] float32, "
                    "mel_lengths [B] int32"),
    }
    if speaker_mode is not None:
        manifest["speaker_input"] = {"kind": speaker_mode, "dim": d_dim}
        if speakers:
            manifest["speakers"] = {
                k: (v if isinstance(v, int) else list(map(float, v)))
                for k, v in speakers.items()}
    if style_frames is not None:
        manifest["style_input"] = {"frames": style_frames,
                                   "num_mels": cfg.audio.num_mels}
    emb = getattr(model, "embedding", None)
    if emb is not None:
        manifest["num_chars"] = emb.num
    dcfg = getattr(cfg, "data", None)
    if dcfg is not None:
        # enough of the text frontend to reproduce the id mapping the
        # artifact was traced with (ExportedSynthesizer.text_to_ids)
        manifest["text"] = {
            "use_phonemes": dcfg.use_phonemes,
            "text_cleaner": dcfg.text_cleaner,
            "phoneme_language": dcfg.phoneme_language,
            "enable_eos_bos": dcfg.enable_eos_bos_chars,
            "cmudict_path": dcfg.cmudict_path,
            "g2p_backend": getattr(dcfg, "g2p_backend", None),
        }
    with open(os.path.join(out_dir, MANIFEST_NAME), "w", encoding="utf-8") as f:
        json.dump(manifest, f, indent=1)
    return manifest


SE_MANIFEST_NAME = "speaker_encoder.json"


def export_speaker_encoder(enc, params, out_dir: str, *, input_dim: int,
                           batch_sizes=(8,), num_frames: int = 160,
                           overlap: float = 0.5,
                           platforms=("cpu", "tpu")) -> dict:
    """Export the GE2E speaker encoder (mel windows [B, F, M] -> L2-normed
    d-vectors [B, D]) so the whole cloning pipeline — reference audio ->
    d-vector -> speech — runs from artifacts alone. Windowing over an
    utterance is host-side numpy (ExportedSpeakerEncoder.embed), matching
    SpeakerEncoder.compute_embedding."""
    import jax
    from jax import export as jexport

    def embed(wins):
        return enc(params, wins)

    os.makedirs(out_dir, exist_ok=True)
    entries = []
    for B in batch_sizes:
        exp = jexport.export(jax.jit(embed), platforms=list(platforms))(
            jax.ShapeDtypeStruct((B, num_frames, input_dim), np.float32))
        name = f"embed_b{B}_f{num_frames}.stablehlo"
        with open(os.path.join(out_dir, name), "wb") as f:
            f.write(exp.serialize())
        entries.append({"file": name, "batch": B})
    manifest = {"entries": entries, "platforms": list(platforms),
                "num_frames": num_frames, "input_dim": input_dim,
                "proj_dim": enc.proj_dim, "overlap": overlap}
    with open(os.path.join(out_dir, SE_MANIFEST_NAME), "w",
              encoding="utf-8") as f:
        json.dump(manifest, f, indent=1)
    return manifest


class ExportedSpeakerEncoder:
    """Compute d-vectors from an export_speaker_encoder() directory."""

    def __init__(self, artifact_dir: str):
        from jax import export as jexport

        with open(os.path.join(artifact_dir, SE_MANIFEST_NAME),
                  encoding="utf-8") as f:
            self.manifest = json.load(f)
        self._fns = {}
        for e in self.manifest["entries"]:
            with open(os.path.join(artifact_dir, e["file"]), "rb") as f:
                self._fns[e["batch"]] = jexport.deserialize(f.read())

    def _call_batched(self, wins: np.ndarray) -> np.ndarray:
        """wins [N, F, M] -> [N, D], chunked through the exported batches."""
        caps = sorted(self._fns)
        out, i = [], 0
        while i < len(wins):
            B = next((b for b in caps if b >= len(wins) - i), caps[-1])
            chunk = wins[i: i + B]
            pad = np.zeros((B, *wins.shape[1:]), np.float32)
            pad[: len(chunk)] = chunk
            out.append(np.asarray(self._fns[B].call(pad))[: len(chunk)])
            i += len(chunk)
        return np.concatenate(out)

    def embed(self, mel: np.ndarray) -> np.ndarray:
        """Sliding-window utterance embedding [T, M] -> [D], the
        SpeakerEncoder.compute_embedding contract on host windows."""
        F = self.manifest["num_frames"]
        mel = np.asarray(mel, np.float32)
        T = mel.shape[0]
        if T <= F:
            reps = -(-F // T)
            wins = np.tile(mel, (reps, 1))[None, :F]
        else:
            hop = max(1, int(F * (1 - self.manifest["overlap"])))
            starts = list(range(0, T - F + 1, hop)) or [0]
            wins = np.stack([mel[s: s + F] for s in starts])
        embs = self._call_batched(wins)
        if len(embs) == 1:
            return embs[0]
        mean = embs.mean(axis=0)
        return mean / max(float(np.linalg.norm(mean)), 1e-8)


class ExportedSynthesizer:
    """Serve from an export_serving() directory — no model code involved."""

    def __init__(self, artifact_dir: str):
        from jax import export as jexport

        with open(os.path.join(artifact_dir, MANIFEST_NAME),
                  encoding="utf-8") as f:
            self.manifest = json.load(f)
        self._fns = {}
        for e in self.manifest["entries"]:
            with open(os.path.join(artifact_dir, e["file"]), "rb") as f:
                self._fns[(e["batch"], e["text_bucket"])] = \
                    jexport.deserialize(f.read())

    def shapes(self):
        return sorted(self._fns)

    def text_to_ids(self, text: str) -> np.ndarray:
        """Reproduce the id mapping recorded in the manifest (same frontend
        the artifact was traced with)."""
        tcfg = self.manifest.get("text") or {}
        if tcfg.get("use_phonemes"):
            from ..text import default_g2p_backend, phoneme_to_sequence

            backend = default_g2p_backend(
                tcfg.get("phoneme_language", "en-us"),
                tcfg.get("cmudict_path"),
                prefer=tcfg.get("g2p_backend"))
            seq = phoneme_to_sequence(
                text, tcfg.get("text_cleaner", "phoneme_cleaners"),
                language=tcfg.get("phoneme_language", "en-us"),
                enable_eos_bos=tcfg.get("enable_eos_bos", False),
                backend=backend)
        else:
            from ..text import text_to_sequence

            seq = text_to_sequence(
                text, tcfg.get("text_cleaner", "basic_cleaners"))
        ids = np.asarray(seq, np.int32)
        n_chars = self.manifest.get("num_chars")
        if n_chars is not None and ids.size and int(ids.max()) >= n_chars:
            raise ValueError(
                f"text maps to id {int(ids.max())} but the exported model "
                f"embeds only {n_chars} symbols — the artifact was traced "
                "with a different symbol table than this frontend")
        return ids

    def _resolve_speaker(self, speaker):
        """Validate ONE request's speaker against the manifest. Returns the
        per-row conditioning value — an int id or a d-vector [D] — or None
        for single-voice artifacts. Raising here (unknown name, wrong dims)
        is per-request, so under micro-batched serving a bad speaker 500s
        alone instead of poisoning its batchmates."""
        spec = self.manifest.get("speaker_input")
        if spec is None:
            if speaker is not None:
                raise ValueError(
                    "this artifact closes over one voice; export with "
                    "speaker_mode to serve multiple speakers")
            return None
        table = self.manifest.get("speakers") or {}
        if isinstance(speaker, str) and speaker in table:
            speaker = table[speaker]
        elif speaker is None:
            if not table:
                raise ValueError(
                    "artifact expects a speaker input and records no "
                    "speaker table; pass one explicitly")
            speaker = next(iter(table.values()))
        if spec["kind"] == "id":
            try:  # HTTP query strings arrive as text: "2" means id 2
                return int(speaker)
            except (TypeError, ValueError):
                raise ValueError(
                    f"unknown speaker {speaker!r}; known: "
                    f"{sorted(table)}") from None
        if isinstance(speaker, str):  # dvector artifacts need a table hit
            raise ValueError(
                f"unknown speaker {speaker!r}; known: {sorted(table)}")
        vec = np.asarray(speaker, np.float32)
        if vec.shape != (spec["dim"],):
            raise ValueError(
                f"d-vector of dim {spec['dim']} required, got {vec.shape}")
        return vec

    def _speaker_args(self, speaker, B: int):
        """Resolve a speaker request against the manifest into kwargs for
        __call__ (speaker_ids or d_vectors, broadcast to batch B)."""
        v = self._resolve_speaker(speaker)
        if v is None:
            return {}
        if self.manifest["speaker_input"]["kind"] == "id":
            return {"speaker_ids": np.full((B,), v, np.int32)}
        return {"d_vectors": np.tile(v, (B, 1))}

    def tts_many(self, texts: list, speakers: list | None = None,
                 seed: int = 0, style_mel=None) -> list:
        """Several independent requests through ONE exported program call
        (bucket-padded) — the device-side half of the HTTP server's dynamic
        micro-batching (infer/batching.py), artifact flavor. `speakers` may
        mix names/ids/d-vectors per request (conditioning is per-row).
        Returns one trimmed float32 waveform per request."""
        if speakers is None:
            speakers = [None] * len(texts)
        if len(speakers) != len(texts):
            raise ValueError(
                f"{len(texts)} texts but {len(speakers)} speakers")
        resolved = [self._resolve_speaker(s) for s in speakers]
        seqs = [self.text_to_ids(t) for t in texts]
        B, T = len(texts), max((len(s) for s in seqs), default=1) or 1
        text_ids = np.zeros((B, T), np.int32)
        lens = np.zeros((B,), np.int32)
        for k, seq in enumerate(seqs):
            text_ids[k, : len(seq)] = seq
            lens[k] = len(seq)
        kw = {}
        spec = self.manifest.get("speaker_input")
        if spec is not None:
            if spec["kind"] == "id":
                kw["speaker_ids"] = np.asarray(resolved, np.int32)
            else:
                kw["d_vectors"] = np.stack(resolved).astype(np.float32)
        style_spec = self.manifest.get("style_input")
        if style_spec is not None:
            if style_mel is None:  # neutral reference keeps GST servable
                style_mel = np.zeros(
                    (B, style_spec["frames"], style_spec["num_mels"]),
                    np.float32)
            kw["style_mel"] = np.asarray(style_mel, np.float32)
        wav, mel_lens = self(text_ids, lens, seed=seed, **kw)
        spf = self.manifest.get("samples_per_frame",
                                self.manifest["hop_length"])
        return [np.asarray(wav[k][: max(int(mel_lens[k]), 1) * spf],
                           np.float32) for k in range(B)]

    def encode_wav_bytes(self, wav: np.ndarray) -> bytes:
        """float waveform -> 16-bit WAV container bytes. (Duplicates the
        Synthesizer encoder on purpose: artifact-only deployments must not
        import model code through infer.synthesizer.)"""
        import io
        import wave

        norm = wav * (32767 / max(0.01, float(np.max(np.abs(wav)))))
        buf = io.BytesIO()
        with wave.open(buf, "wb") as f:
            f.setnchannels(1)
            f.setsampwidth(2)
            f.setframerate(self.manifest["sample_rate"])
            f.writeframes(norm.astype(np.int16).tobytes())
        return buf.getvalue()

    def tts_to_wav_bytes(self, text: str, speaker=None, seed: int = 0,
                         style_mel=None) -> bytes:
        """text -> WAV container bytes, Synthesizer.tts_to_wav_bytes shape —
        lets the HTTP server serve straight from an artifact directory.
        `speaker` may be a name from the manifest's speaker table, an id, or
        a d-vector, per the artifact's speaker_input. For GST artifacts,
        `style_mel` [F, n_mels] selects the style; without one a neutral
        all-zeros reference is used so the endpoint stays servable."""
        sty = None if style_mel is None else \
            np.asarray(style_mel, np.float32)[None]
        wav = self.tts_many([text], [speaker], seed=seed, style_mel=sty)[0]
        return self.encode_wav_bytes(wav)

    def __call__(self, text_ids: np.ndarray, lengths: np.ndarray,
                 seed: int = 0, speaker_ids=None, d_vectors=None,
                 style_mel=None):
        """text_ids [B, T] int32 -> (wav [B, L] f32, mel_lengths [B]).
        Picks the smallest exported shape that fits and pads into it; a
        batch larger than every exported batch is chunked through the
        biggest one. speaker_ids [B] / d_vectors [B, D] are required iff
        the artifact was exported with the matching speaker_mode;
        style_mel [B, F, M] (tiled/truncated to the exported style window)
        iff it was exported with style_frames (GST)."""
        import jax

        spec = self.manifest.get("speaker_input")
        style_spec = self.manifest.get("style_input")
        B, T = text_ids.shape
        t_fit = [s for s in self._fns if s[1] >= T]
        if not t_fit:
            raise ValueError(
                f"no exported shape fits (B={B}, T={T}); have {self.shapes()}")
        cap = max(s[0] for s in t_fit)
        if B > cap:
            parts = [self(text_ids[i: i + cap], lengths[i: i + cap], seed,
                          None if speaker_ids is None
                          else speaker_ids[i: i + cap],
                          None if d_vectors is None
                          else d_vectors[i: i + cap],
                          None if style_mel is None
                          else style_mel[i: i + cap])
                     for i in range(0, B, cap)]
            return (np.concatenate([p[0] for p in parts]),
                    np.concatenate([p[1] for p in parts]))
        fit = [s for s in t_fit if s[0] >= B]
        Bs, Ts = min(fit)
        text = np.zeros((Bs, Ts), np.int32)
        text[:B, :T] = text_ids
        lens = np.zeros((Bs,), np.int32)
        lens[:B] = lengths
        args = [text, lens]
        if spec is not None:
            if spec["kind"] == "id":
                if speaker_ids is None:
                    raise ValueError("artifact expects speaker_ids [B]")
                sid = np.zeros((Bs,), np.int32)
                sid[:B] = np.asarray(speaker_ids, np.int32)
                args.append(sid)
            else:
                if d_vectors is None:
                    raise ValueError(
                        f"artifact expects d_vectors [B, {spec['dim']}]")
                dv = np.zeros((Bs, spec["dim"]), np.float32)
                dv[:B] = np.asarray(d_vectors, np.float32)
                args.append(dv)
        elif speaker_ids is not None or d_vectors is not None:
            raise ValueError("artifact takes no speaker input")
        if style_spec is not None:
            if style_mel is None:
                raise ValueError(
                    f"artifact expects style_mel [B, F, "
                    f"{style_spec['num_mels']}]")
            F = style_spec["frames"]
            style_mel = np.asarray(style_mel, np.float32)
            if style_mel.shape[1] < F:  # tile short references into window
                reps = -(-F // style_mel.shape[1])
                style_mel = np.tile(style_mel, (1, reps, 1))
            sty = np.zeros((Bs, F, style_spec["num_mels"]), np.float32)
            sty[:B] = style_mel[:, :F]
            args.append(sty)
        elif style_mel is not None:
            raise ValueError("artifact takes no style input")
        args.append(jax.random.key_data(
            jax.random.PRNGKey(seed)).astype(np.uint32))
        wav, mel_lens = self._fns[(Bs, Ts)].call(*args)
        return np.asarray(wav)[:B], np.asarray(mel_lens)[:B]
