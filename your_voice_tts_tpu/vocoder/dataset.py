"""Vocoder datasets (reference vocoder/datasets/gan_dataset.py):
aligned (mel window, audio segment) pairs sampled from full clips."""

from __future__ import annotations

import numpy as np

from ..audio import AudioProcessor


class GANDataset:
    """Random fixed-length audio segments with their aligned mel windows.

    seq_len must be a multiple of hop_length. Mel frames are computed once per
    clip through the jitted DSP path and windows are sliced per sample.
    For WaveRNN, `pad` extra conditioning frames are kept on each side.
    """

    def __init__(self, items: list[list[str]], ap: AudioProcessor,
                 seq_len: int = 8192, pad: int = 0, return_segments: bool = True):
        assert seq_len % ap.hop_length == 0
        self.ap = ap
        self.seq_len = seq_len
        self.pad = pad
        self.return_segments = return_segments
        self.clips = []
        for text, wav_path, _speaker in items:
            wav = ap.load_wav(wav_path)
            if len(wav) < seq_len + 2 * (pad + 1) * ap.hop_length:
                reps = int(np.ceil((seq_len + 2 * (pad + 1) * ap.hop_length) / len(wav)))
                wav = np.tile(wav, reps)
            mel = ap.melspectrogram(wav).T.astype(np.float32)  # [T, n_mels]
            self.clips.append((wav.astype(np.float32), mel))

    def __len__(self) -> int:
        return len(self.clips)

    def sample_batch(self, batch_size: int, rng: np.random.Generator):
        """Returns (mel [B, F+2*pad, n_mels], audio [B, seq_len])."""
        hop = self.ap.hop_length
        frames = self.seq_len // hop
        mels, audios = [], []
        for _ in range(batch_size):
            wav, mel = self.clips[int(rng.integers(len(self.clips)))]
            max_start_f = mel.shape[0] - frames - 2 * self.pad - 1
            f0 = int(rng.integers(self.pad, max(self.pad + 1, max_start_f)))
            s0 = f0 * hop
            audios.append(wav[s0: s0 + self.seq_len])
            mels.append(mel[f0 - self.pad: f0 + frames + self.pad])
        return np.stack(mels), np.stack(audios)
