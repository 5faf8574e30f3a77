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
        from ..text import default_g2p_backend

        backend = default_g2p_backend(cfg.data.phoneme_language,
                                      cfg.data.cmudict_path,
                                      prefer=cfg.data.g2p_backend)
        return phoneme_to_sequence(text, cfg.data.text_cleaner,
                                   language=cfg.data.phoneme_language,
                                   enable_eos_bos=cfg.data.enable_eos_bos_chars,
                                   backend=backend)
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
                    max_decoder_steps: int | None = None, mesh=None) -> list[dict]:
    """Batched synthesis; returns one result dict per input text.

    mesh: an optional 1-axis ('data') jax.sharding.Mesh — the batch is
    sharded over it (data-parallel serving: params replicated, each chip
    decodes its slice of the batch; scale-out mirror of the DP trainer)."""
    import jax.numpy as jnp

    seqs = [text_to_seq(t, cfg) for t in texts]
    text_arr, lengths = _pad_texts(seqs)

    style_mel = None
    if style_wav is not None:
        style_mel = ap.melspectrogram(style_wav).T[None].astype(np.float32)
        style_mel = np.broadcast_to(style_mel,
                                    (len(texts),) + style_mel.shape[1:])

    # serving knobs: early-exit decoding (stop when all samples fire their
    # stop token instead of always scanning max_decoder_steps) — in-kernel
    # when the Pallas decode route applies (single launch, weights stay in
    # VMEM), host-chunked otherwise — and the configured inference compute
    # dtype (bf16 = MXU-native serving precision)
    if getattr(model, "pallas_decode_supported",
               lambda T, B=1: False)(text_arr.shape[1], text_arr.shape[0]):
        infer_fn = model.inference
    else:
        infer_fn = getattr(model, "inference_incremental", model.inference)
    compute_dtype = None
    if getattr(cfg.model, "inference_compute_dtype", "float32") == "bfloat16":
        compute_dtype = jnp.bfloat16
    if mesh is not None:
        out = _mesh_inference(
            mesh, model, variables, text_arr, lengths,
            speaker_ids=speaker_ids, d_vectors=d_vectors, style_mel=style_mel,
            max_decoder_steps=max_decoder_steps, compute_dtype=compute_dtype)
    else:
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
    gl_specs: list[np.ndarray] = []   # rows that invert via Griffin-Lim
    gl_rows: list[int] = []
    for i, text in enumerate(texts):
        L = max(int(mel_lens[i]), model.r)
        spec = mels[i, :L].T                           # reference layout [F, T]
        res = {"text": text, "mel_postnet_spec": spec,
               "alignment": aligns[i], "stop_tokens": stops[i]}
        if vocoder is not None and not is_linear:
            wav = np.asarray(vocoder(spec))
            if trim_silence:
                wav = wav[: ap.find_endpoint(wav)]
            res["wav"] = wav
        elif use_griffin_lim or (vocoder is not None and is_linear):
            # Tacotron(1) emits a linear spectrogram: invert it directly.
            # Rows are collected and inverted in ONE length-bucketed batched
            # Griffin-Lim pass below — each row is trimmed to its own stop
            # first, so post-stop frames cost no GL compute, and a batch-1
            # launch per row (latency-bound on TPU) is avoided entirely.
            gl_rows.append(i)
            gl_specs.append(spec)
        results.append(res)
    if gl_rows:
        wavs = (ap.inv_spectrogram_batch(gl_specs) if is_linear
                else ap.inv_melspectrogram_batch(gl_specs))
        for i, wav in zip(gl_rows, wavs):
            if trim_silence:
                wav = wav[: ap.find_endpoint(wav)]
            results[i]["wav"] = wav
    return results


def _mesh_inference(mesh, model, variables, text_arr, lengths, *,
                    speaker_ids=None, d_vectors=None, style_mel=None,
                    max_decoder_steps=None, compute_dtype=None) -> dict:
    """Data-parallel serving: shard the batch over the mesh's 'data' axis
    with params replicated; each device runs the full inference (including
    the Pallas decode kernel where supported — shard_map hands every device
    its local batch slice, so the kernel composes) and XLA gathers the
    outputs. The batch is padded to a multiple of the device count with
    dummy rows, sliced away on return."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P
    shard_map = jax.shard_map

    n = mesh.devices.size
    B0 = text_arr.shape[0]
    Bp = ((B0 + n - 1) // n) * n

    def padb(a):
        if a is None:
            return None
        a = np.asarray(a)
        if Bp == B0:
            return a
        # dummy rows REPLICATE row 0 instead of padding zeros: a zero-text
        # row may never fire its stop token, and the decode (kernel early
        # exit included) runs until EVERY row stops — zero rows would force
        # the whole lockstep program to max_decoder_steps
        reps = np.repeat(a[:1], Bp - B0, axis=0)
        return np.concatenate([a, reps], axis=0)

    text_arr, lengths = padb(text_arr), padb(lengths)
    opt = {"speaker_ids": padb(speaker_ids),
           "speaker_embeddings": padb(d_vectors),
           "style_mel": padb(style_mel)}
    keys = [k for k, v in opt.items() if v is not None]
    vals = [jnp.asarray(opt[k]) for k in keys]

    def fn(v, t, l, *extra):
        kw = dict(zip(keys, extra))
        return model.inference(v, t, l, rng=None,
                               max_decoder_steps=max_decoder_steps,
                               compute_dtype=compute_dtype, **kw)

    out = shard_map(
        fn, mesh=mesh,
        in_specs=(P(),) + (P("data"),) * (2 + len(vals)),
        out_specs=P("data"), check_vma=False,
    )(variables, jnp.asarray(text_arr), jnp.asarray(lengths), *vals)
    return {k: v[:B0] for k, v in out.items()}


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
