"""Synthesizer — the serving facade (reference server/synthesizer.py).

Loads a trained TTS checkpoint (+ optional neural vocoder), splits long input
into sentences, synthesizes, and concatenates with inter-sentence silence.
The reference loops sentences sequentially; here they are synthesized as ONE
bucketed batch (SURVEY.md SS3.4 note: "reimplemented as batched bucketing").
"""

from __future__ import annotations

import io
import re
import wave

import numpy as np

from ..audio import AudioProcessor
from ..config import Config, load_config
from ..models import setup_model
from ..text import phonemes, symbols
from ..train.checkpoint import load_checkpoint
from ..utils.speakers import load_speaker_mapping, parse_speakers
from .synthesis import synthesis_batch

_SENTENCE_RE = re.compile(r"(?<=[.!?])\s+|\n+")


def split_into_sentences(text: str) -> list[str]:
    """Regex segmenter (reference Synthesizer.split_into_sentences)."""
    parts = [s.strip() for s in _SENTENCE_RE.split(text)]
    return [s for s in parts if s]


class Synthesizer:
    def __init__(self, tts_config: str | Config, tts_checkpoint: str | None = None,
                 vocoder_config: str | Config | None = None,
                 vocoder_checkpoint: str | None = None,
                 speakers_json: str | None = None, rng_seed: int = 0):
        self.cfg = load_config(tts_config) if isinstance(tts_config, str) else tts_config
        self.ap = AudioProcessor(self.cfg.audio)
        self.speaker_ids: dict[str, int] = {}
        self.speaker_embeddings = None
        num_speakers, spk_dim = 0, 0
        if speakers_json:
            mapping = load_speaker_mapping(speakers_json)
            self.speaker_ids, self.speaker_embeddings = parse_speakers(mapping)
            num_speakers = len(self.speaker_ids)
            if self.speaker_embeddings:
                spk_dim = len(next(iter(self.speaker_embeddings.values())))
        self.load_tts(tts_checkpoint, num_speakers, spk_dim)
        self.vocoder = None
        if vocoder_config is not None:
            self.load_vocoder(vocoder_config, vocoder_checkpoint)
        import jax
        self._rng = jax.random.PRNGKey(rng_seed)

    # --- loading ---------------------------------------------------------

    def load_tts(self, checkpoint: str | None, num_speakers: int, spk_dim: int) -> None:
        num_chars = len(phonemes) if self.cfg.data.use_phonemes else len(symbols)
        import jax

        self.model = setup_model(num_chars, num_speakers, self.cfg, spk_dim)
        self.variables = self.model.init(jax.random.PRNGKey(0))
        if checkpoint:
            params, state, _, meta = load_checkpoint(
                checkpoint, params=self.variables["params"],
                model_state=self.variables["state"], opt_state=None)
            self.variables = {"params": params, "state": state}
            if meta.get("g2p_backend") and self.cfg.data.use_phonemes and \
                    self.cfg.data.g2p_backend != meta["g2p_backend"]:
                # pin inference to the phoneme stream the model trained on
                # (default_g2p_backend honors cfg.data.g2p_backend)
                import dataclasses
                self.cfg = dataclasses.replace(
                    self.cfg, data=dataclasses.replace(
                        self.cfg.data, g2p_backend=meta["g2p_backend"]))
            if "r" in meta:
                self.model.set_r(meta["r"])

    def load_vocoder(self, vocoder_config, checkpoint: str | None) -> None:
        from ..vocoder.synthesizer import VocoderSynthesizer

        self.vocoder = VocoderSynthesizer(vocoder_config, checkpoint,
                                          tts_audio_cfg=self.cfg.audio)

    # --- synthesis -------------------------------------------------------

    def _resolve_speaker(self, speaker):
        """speaker (name | id | numeric string | None) -> ("none", None) |
        ("id", int) | ("dvec", np.ndarray). Validation mirrors the
        reference's speaker-mapping lookup (utils/speakers.py)."""
        if speaker is None or not self.speaker_ids:
            return "none", None
        if isinstance(speaker, str) and speaker not in self.speaker_ids:
            try:  # HTTP query strings arrive as text: "2" means id 2
                speaker = int(speaker)
            except ValueError:
                raise ValueError(
                    f"unknown speaker {speaker!r}; known: "
                    f"{sorted(self.speaker_ids)}") from None
        if isinstance(speaker, str):
            sid = self.speaker_ids[speaker]
        else:
            sid = int(speaker)
            if not 0 <= sid < len(self.speaker_ids):
                raise ValueError(
                    f"speaker id {sid} out of range "
                    f"0..{len(self.speaker_ids) - 1}")
        if self.speaker_embeddings:
            name = speaker if isinstance(speaker, str) else \
                sorted(self.speaker_embeddings)[sid]
            return "dvec", np.asarray(self.speaker_embeddings[name],
                                      np.float32)
        return "id", sid

    def tts(self, text: str, speaker: str | int | None = None,
            style_wav: np.ndarray | None = None) -> np.ndarray:
        """Full text -> waveform (numpy float32)."""
        return self.tts_many([text], [speaker], style_wav=style_wav)[0]

    def tts_many(self, texts: list[str], speakers: list | None = None,
                 style_wav: np.ndarray | None = None) -> list[np.ndarray]:
        """Synthesize several independent requests in ONE device batch.

        All sentences from all requests ride a single `synthesis_batch`
        call (per speaker-conditioning mode), then regroup per request —
        the device-side half of dynamic micro-batched serving
        (infer/batching.py). N concurrent requests cost ~1 batched decode
        instead of N sequential batch-1 decodes."""
        import jax

        if speakers is None:
            speakers = [None] * len(texts)
        if len(speakers) != len(texts):
            raise ValueError(
                f"{len(texts)} texts but {len(speakers)} speakers")
        # flatten request sentences; group rows by conditioning mode (a
        # single program input cannot mix id-conditioned and unconditioned
        # rows) — deployments are homogeneous, so normally 1 group = 1 call
        sent_of_req: list[list[int]] = []   # request -> flat sentence idxs
        flat: list[str] = []
        modes: list[tuple[str, object]] = []
        for text, speaker in zip(texts, speakers):
            mode = self._resolve_speaker(speaker)
            sentences = split_into_sentences(text) or [text]
            idxs = []
            for s in sentences:
                idxs.append(len(flat))
                flat.append(s)
                modes.append(mode)
            sent_of_req.append(idxs)

        vocoder_fn = self.vocoder.mel_to_wav if self.vocoder else None
        wavs: list[np.ndarray | None] = [None] * len(flat)
        for mode in ("none", "id", "dvec"):
            rows = [i for i in range(len(flat)) if modes[i][0] == mode]
            if not rows:
                continue
            speaker_ids = d_vectors = None
            if mode == "id":
                speaker_ids = np.asarray([modes[i][1] for i in rows],
                                         np.int32)
            elif mode == "dvec":
                d_vectors = np.stack([modes[i][1] for i in rows])
            self._rng, sub = jax.random.split(self._rng)
            results = synthesis_batch(
                self.model, self.variables, [flat[i] for i in rows],
                self.cfg, self.ap, speaker_ids=speaker_ids,
                d_vectors=d_vectors, style_wav=style_wav,
                use_griffin_lim=self.vocoder is None, vocoder=vocoder_fn,
                rng=sub, trim_silence=True)
            for i, res in zip(rows, results):
                wavs[i] = np.asarray(res["wav"], np.float32)

        silence = np.zeros(int(0.25 * self.ap.sample_rate), np.float32)
        out = []
        for idxs in sent_of_req:
            pieces = []
            for j, i in enumerate(idxs):
                pieces.append(wavs[i])
                if j != len(idxs) - 1:
                    pieces.append(silence)
            out.append(np.concatenate(pieces) if pieces else silence)
        return out

    def tts_streaming(self, text: str, chunk_chars: int = 120,
                      speaker: str | int | None = None):
        """Generator: yield waveform chunks as they are decoded, with decoder
        state carried across text chunks via Tacotron2.inference_truncated —
        arbitrarily long text streams with memory bounded by the chunk size
        (reference inference_truncated; SURVEY.md:96).

        Chunks are sentence-aligned where possible; sentences longer than
        chunk_chars are split hard. `speaker` conditions every chunk (same
        name/id/d-vector semantics as tts)."""
        import jax
        import jax.numpy as jnp

        from .synthesis import text_to_seq

        if not hasattr(self.model, "inference_truncated"):
            yield self.tts(text, speaker=speaker)
            return
        mode, val = self._resolve_speaker(speaker)
        spk_kw = {}
        if mode == "id":
            spk_kw["speaker_ids"] = jnp.asarray([val], jnp.int32)
        elif mode == "dvec":
            spk_kw["speaker_embeddings"] = jnp.asarray(val)[None]
        pieces: list[str] = []
        for s in split_into_sentences(text) or [text]:
            while len(s) > chunk_chars:
                pieces.append(s[:chunk_chars])
                s = s[chunk_chars:]
            pieces.append(s)
        stream = None
        for piece in pieces:
            seq = text_to_seq(piece, self.cfg)
            text_ids = jnp.asarray(seq, jnp.int32)[None]
            lengths = jnp.asarray([len(seq)], jnp.int32)
            out, stream = self.model.inference_truncated(
                self.variables, text_ids, lengths, stream_state=stream,
                **spk_kw)
            n = int(out["mel_lengths"][0])
            mel = np.asarray(out["postnet_outputs"][0][:max(n, 1)])
            if self.vocoder is not None:
                # mel_to_wav takes the reference [n_mels, T] layout and
                # returns the 1-D waveform directly
                wav = np.asarray(self.vocoder.mel_to_wav(mel.T))
            else:
                wav = np.asarray(self.ap.inv_melspectrogram(mel.T))
            yield wav.astype(np.float32)

    def encode_wav_bytes(self, wav: np.ndarray) -> bytes:
        """float waveform -> 16-bit WAV container bytes. A zero-length
        waveform (e.g. a degenerate duration prediction) encodes as a valid
        empty container instead of crashing the serving path."""
        if wav.size == 0:
            wav = np.zeros((1,), np.float32)
        norm = wav * (32767 / max(0.01, float(np.max(np.abs(wav)))))
        buf = io.BytesIO()
        with wave.open(buf, "wb") as f:
            f.setnchannels(1)
            f.setsampwidth(2)
            f.setframerate(self.ap.sample_rate)
            f.writeframes(norm.astype(np.int16).tobytes())
        return buf.getvalue()

    def tts_to_wav_bytes(self, text: str, **kw) -> bytes:
        """WAV container bytes for HTTP streaming (reference server flow)."""
        return self.encode_wav_bytes(self.tts(text, **kw))
