"""Speaker-encoder dataset (reference speaker_encoder/dataset.py): random
N-speaker x M-utterance batches of fixed-length mel windows."""

from __future__ import annotations

import numpy as np

from ..audio import AudioProcessor


class SpeakerEncoderDataset:
    def __init__(self, items: list[list[str]], ap: AudioProcessor,
                 num_frames: int = 160, augment_wav_fn=None):
        """augment_wav_fn: optional wav -> [extra wavs] hook; each extra
        view registers as another utterance of the same speaker, so GE2E
        pulls the views together (e.g. Griffin-Lim-roundtripped audio, to
        make d-vectors robust to re-embedding synthesized speech)."""
        self.num_frames = num_frames
        self.by_speaker: dict[str, list[np.ndarray]] = {}
        for _text, wav_path, speaker in items:
            wav = ap.load_wav(wav_path)
            wavs = [wav]
            if augment_wav_fn is not None:
                wavs += list(augment_wav_fn(wav))
            for w in wavs:
                mel = ap.melspectrogram(w).T.astype(np.float32)
                if mel.shape[0] < num_frames:
                    mel = np.tile(mel, (-(-num_frames // mel.shape[0]), 1))
                self.by_speaker.setdefault(speaker, []).append(mel)
        self.speakers = sorted(self.by_speaker)

    def sample_batch(self, num_speakers: int, num_utters: int,
                     rng: np.random.Generator) -> np.ndarray:
        """[N, M, num_frames, n_mels] mel windows."""
        chosen = rng.choice(len(self.speakers),
                            size=min(num_speakers, len(self.speakers)),
                            replace=False)
        out = []
        for si in chosen:
            clips = self.by_speaker[self.speakers[int(si)]]
            utts = []
            for _ in range(num_utters):
                mel = clips[int(rng.integers(len(clips)))]
                s = int(rng.integers(0, max(1, mel.shape[0] - self.num_frames + 1)))
                utts.append(mel[s: s + self.num_frames])
            out.append(np.stack(utts))
        return np.stack(out)
