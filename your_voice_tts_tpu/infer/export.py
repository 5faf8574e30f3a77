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

The exported program uses the XLA scan decode path (portable across
platforms); the Pallas kernel route stays a runtime optimization for live
serving. Multi-platform export (cpu+tpu) is supported by jax.export — lower
once on any host, run on either device kind.
"""

from __future__ import annotations

import json
import os

import numpy as np

MANIFEST_NAME = "manifest.json"


def make_serving_fn(model, variables, cfg, ap, *, max_decoder_steps=None,
                    vocoder=None):
    """Build the pure e2e fn (text [B, T] i32, lengths [B] i32, key) ->
    (wav [B, L] f32, mel_lengths [B] i32). Weights are closed over, so
    export bakes them into the artifact.

    vocoder: optional VocoderSynthesizer — its generator (MelGAN / PWGAN)
    replaces Griffin-Lim inside the artifact, weights baked in alongside the
    TTS model's. WaveRNN is excluded: its sample-serial generation belongs to
    the live Pallas route, not a portable artifact."""
    import jax.numpy as jnp

    from ..ops import dsp
    from ..ops.filters import hann_window

    acfg = cfg.audio
    compute_dtype = (jnp.bfloat16 if getattr(
        cfg.model, "inference_compute_dtype", "float32") == "bfloat16"
        else None)
    if getattr(model, "output_type", "mel") == "linear":
        raise NotImplementedError(
            "export currently covers mel models (Tacotron2); the Tacotron1 "
            "linear path serves live via infer/synthesis.py")
    if vocoder is not None:
        vkind = vocoder.cfg.model
        if vkind not in ("melgan", "pwgan"):
            raise NotImplementedError(
                f"export supports melgan/pwgan vocoders, not {vkind!r}")
        vmodel, vparams = vocoder.model, vocoder.params

        def serve_vocoder(text, lengths, key):
            out = model.inference(variables, text, lengths, rng=None,
                                  max_decoder_steps=max_decoder_steps,
                                  compute_dtype=compute_dtype,
                                  use_pallas=False)
            mel = out["postnet_outputs"]  # [B, T, n_mels], normalized
            wav = (vmodel(vparams, mel, key=key) if vkind == "pwgan"
                   else vmodel(vparams, mel))
            return wav, out["mel_lengths"]

        return serve_vocoder
    window = jnp.asarray(hann_window(acfg.win_length, acfg.fft_size),
                         jnp.float32)
    inv_basis = jnp.asarray(ap.inv_mel_basis)
    stats = None
    if getattr(ap, "mel_stats", None) is not None:
        stats = tuple(jnp.asarray(s) for s in ap.mel_stats)

    def serve(text, lengths, key):
        out = model.inference(variables, text, lengths, rng=None,
                              max_decoder_steps=max_decoder_steps,
                              compute_dtype=compute_dtype, use_pallas=False)
        wav = dsp.inv_melspectrogram_batch(
            out["postnet_outputs"], key, mel_inv_basis=inv_basis,
            window=window, n_fft=acfg.fft_size, hop=acfg.hop_length,
            preemph=acfg.preemphasis, ref_level_db=acfg.ref_level_db,
            min_level_db=acfg.min_level_db, spec_gain=acfg.spec_gain,
            max_norm=acfg.max_norm, symmetric=acfg.symmetric_norm,
            clip=acfg.clip_norm, power=acfg.power,
            gl_iters=acfg.griffin_lim_iters,
            gl_momentum=acfg.griffin_lim_momentum,
            signal_norm=acfg.signal_norm, stats=stats, use_pallas=False)
        return wav, out["mel_lengths"]

    return serve


def export_serving(model, variables, cfg, ap, out_dir: str, *,
                   batch_sizes=(1,), text_buckets=(128,),
                   max_decoder_steps=None, platforms=("cpu", "tpu"),
                   vocoder=None) -> dict:
    """Export one artifact per (batch, text-bucket) shape into out_dir and
    write a manifest. Returns the manifest dict. With a vocoder
    (VocoderSynthesizer), its generator replaces Griffin-Lim in the
    artifact."""
    import jax
    from jax import export as jexport

    serve = make_serving_fn(model, variables, cfg, ap,
                            max_decoder_steps=max_decoder_steps,
                            vocoder=vocoder)
    os.makedirs(out_dir, exist_ok=True)
    steps = max_decoder_steps or cfg.model.max_decoder_steps
    entries = []
    for B in batch_sizes:
        for T in text_buckets:
            exp = jexport.export(jax.jit(serve), platforms=list(platforms))(
                jax.ShapeDtypeStruct((B, T), np.int32),
                jax.ShapeDtypeStruct((B,), np.int32),
                jax.ShapeDtypeStruct((2,), np.uint32))
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
        "r": cfg.model.r,
        "max_decoder_steps": steps,
        "waveform": waveform,
        "samples_per_frame": upsample,
        "key_dtype": "uint32[2] (jax PRNG key data for stochastic phase)",
        "inputs": "text ids [B, T] int32 (zero-padded), lengths [B] int32",
        "outputs": ("wav [B, steps*r*samples_per_frame] float32, "
                    "mel_lengths [B] int32"),
    }
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
        }
    with open(os.path.join(out_dir, MANIFEST_NAME), "w", encoding="utf-8") as f:
        json.dump(manifest, f, indent=1)
    return manifest


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
                tcfg.get("cmudict_path"))
            seq = phoneme_to_sequence(
                text, language=tcfg.get("phoneme_language", "en-us"),
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

    def tts_to_wav_bytes(self, text: str, speaker=None, seed: int = 0) -> bytes:
        """text -> WAV container bytes, Synthesizer.tts_to_wav_bytes shape —
        lets the HTTP server serve straight from an artifact directory."""
        import io
        import wave

        if speaker is not None:
            raise ValueError(
                "exported artifacts close over one voice; re-export per "
                "speaker for multi-speaker serving")
        ids = self.text_to_ids(text)[None]
        wav, mel_lens = self(ids, np.array([ids.shape[1]], np.int32),
                             seed=seed)
        spf = self.manifest.get("samples_per_frame",
                                self.manifest["hop_length"])
        w = wav[0][: max(int(mel_lens[0]), 1) * spf]
        norm = w * (32767 / max(0.01, float(np.max(np.abs(w)))))
        buf = io.BytesIO()
        with wave.open(buf, "wb") as f:
            f.setnchannels(1)
            f.setsampwidth(2)
            f.setframerate(self.manifest["sample_rate"])
            f.writeframes(norm.astype(np.int16).tobytes())
        return buf.getvalue()

    def __call__(self, text_ids: np.ndarray, lengths: np.ndarray, seed: int = 0):
        """text_ids [B, T] int32 -> (wav [B, L] f32, mel_lengths [B]).
        Picks the smallest exported shape that fits and pads into it."""
        import jax

        B, T = text_ids.shape
        fit = [s for s in self._fns if s[0] >= B and s[1] >= T]
        if not fit:
            raise ValueError(
                f"no exported shape fits (B={B}, T={T}); have {self.shapes()}")
        Bs, Ts = min(fit)
        text = np.zeros((Bs, Ts), np.int32)
        text[:B, :T] = text_ids
        lens = np.zeros((Bs,), np.int32)
        lens[:B] = lengths
        key = jax.random.key_data(jax.random.PRNGKey(seed)).astype(np.uint32)
        wav, mel_lens = self._fns[(Bs, Ts)].call(text, lens, key)
        return np.asarray(wav)[:B], np.asarray(mel_lens)[:B]
