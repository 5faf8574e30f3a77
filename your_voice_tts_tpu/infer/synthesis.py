"""Synthesis choke-point (reference utils/synthesis.py; SURVEY.md SS3.3).

`synthesis()` mirrors the reference's single-utterance API: text -> id
sequence -> model.inference -> mel -> (Griffin-Lim | neural vocoder) -> wav,
returning the same artifact set (wav, alignment, postnet mel, stop tokens).

`synthesis_batch()` is the TPU-first addition the reference lacks: N
utterances are length-bucketed into one padded batch and decoded by a single
compiled scan — per-sample stop masking keeps finished rows idle — then
trimmed on host. This is what makes >=100x realtime batched synthesis
possible (BASELINE.json configs #2).
"""

from __future__ import annotations

import numpy as np

from ..audio import AudioProcessor
from ..config import Config
from ..text import phoneme_to_sequence, text_to_sequence

TEXT_PAD = 8


def text_to_seq(text: str, cfg: Config) -> np.ndarray:
    """Reference text_to_seqvec: cleaner + (optional) phoneme path."""
    if cfg.data.use_phonemes:
        return phoneme_to_sequence(text, language=cfg.data.phoneme_language,
                                   enable_eos_bos=cfg.data.enable_eos_bos_chars)
    return text_to_sequence(text, cfg.data.text_cleaner)


def _pad_texts(seqs: list[np.ndarray]) -> tuple[np.ndarray, np.ndarray]:
    max_len = max(len(s) for s in seqs)
    bucket = ((max_len + TEXT_PAD - 1) // TEXT_PAD) * TEXT_PAD
    text = np.zeros((len(seqs), bucket), np.int32)
    lengths = np.zeros((len(seqs),), np.int32)
    for i, s in enumerate(seqs):
        text[i, : len(s)] = s
        lengths[i] = len(s)
    return text, lengths


def synthesis_batch(model, variables, texts: list[str], cfg: Config,
                    ap: AudioProcessor, speaker_ids=None, d_vectors=None,
                    style_wav: np.ndarray | None = None, use_griffin_lim: bool = True,
                    vocoder=None, rng=None, trim_silence: bool = False,
                    max_decoder_steps: int | None = None) -> list[dict]:
    """Batched synthesis; returns one result dict per input text."""
    import jax.numpy as jnp

    seqs = [text_to_seq(t, cfg) for t in texts]
    text_arr, lengths = _pad_texts(seqs)

    style_mel = None
    if style_wav is not None:
        style_mel = ap.melspectrogram(style_wav).T[None].astype(np.float32)
        style_mel = np.broadcast_to(style_mel,
                                    (len(texts),) + style_mel.shape[1:])

    # serving knobs: chunked early-exit decoding (stop when all samples fire
    # their stop token instead of always scanning max_decoder_steps), and the
    # configured inference compute dtype (bf16 = MXU-native serving precision)
    infer_fn = getattr(model, "inference_incremental", model.inference)
    compute_dtype = None
    if getattr(cfg.model, "inference_compute_dtype", "float32") == "bfloat16":
        compute_dtype = jnp.bfloat16
    out = infer_fn(
        variables, jnp.asarray(text_arr), jnp.asarray(lengths), rng=rng,
        speaker_ids=None if speaker_ids is None else jnp.asarray(speaker_ids),
        speaker_embeddings=None if d_vectors is None else jnp.asarray(d_vectors),
        style_mel=None if style_mel is None else jnp.asarray(style_mel),
        max_decoder_steps=max_decoder_steps, compute_dtype=compute_dtype)

    mels = np.asarray(out["postnet_outputs"])          # [B, T, n_mels]
    aligns = np.asarray(out["alignments"])
    stops = np.asarray(out["stop_probs"])
    mel_lens = np.asarray(out["mel_lengths"])

    is_linear = getattr(model, "output_type", "mel") == "linear"
    results = []
    for i, text in enumerate(texts):
        L = max(int(mel_lens[i]), model.r)
        spec = mels[i, :L].T                           # reference layout [F, T]
        res = {"text": text, "mel_postnet_spec": spec,
               "alignment": aligns[i], "stop_tokens": stops[i]}
        if vocoder is not None and not is_linear:
            res["wav"] = vocoder(spec)
        elif use_griffin_lim or (vocoder is not None and is_linear):
            # Tacotron(1) emits a linear spectrogram: invert it directly
            wav = (ap.inv_spectrogram(spec) if is_linear
                   else ap.inv_melspectrogram(spec))
            if trim_silence:
                wav = wav[: ap.find_endpoint(wav)]
            res["wav"] = wav
        results.append(res)
    return results


def synthesis(model, variables, text: str, cfg: Config, ap: AudioProcessor,
              speaker_id: int | None = None, style_wav=None, d_vector=None,
              use_griffin_lim: bool = True, vocoder=None, rng=None,
              trim_silence: bool = False) -> dict:
    """Single-utterance synthesis (reference utils/synthesis.synthesis)."""
    return synthesis_batch(
        model, variables, [text], cfg, ap,
        speaker_ids=None if speaker_id is None else np.asarray([speaker_id]),
        d_vectors=None if d_vector is None else np.asarray([d_vector]),
        style_wav=style_wav, use_griffin_lim=use_griffin_lim,
        vocoder=vocoder, rng=rng, trim_silence=trim_silence)[0]
