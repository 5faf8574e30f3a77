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
                 seq_len: int = 8192, pad: int = 0,
                 return_segments: bool = True, cache_clips: int = 256):
        assert seq_len % ap.hop_length == 0
        self.ap = ap
        self.seq_len = seq_len
        self.pad = pad
        self.return_segments = return_segments
        # clips load lazily with a bounded LRU (full-corpus eager decode of
        # e.g. LJSpeech would hold ~8 GB of f32 audio + mels and stall the
        # first step for minutes; the reference loads per item too). Small
        # corpora (<= cache_clips) end up fully cached after one epoch.
        self.paths = [wav_path for _text, wav_path, _speaker in items]
        self.cache_clips = cache_clips
        import collections
        self._cache: "collections.OrderedDict[int, tuple]" = \
            collections.OrderedDict()

    def _clip(self, idx: int):
        if idx in self._cache:
            self._cache.move_to_end(idx)
            return self._cache[idx]
        wav = self.ap.load_wav(self.paths[idx])
        need = self.seq_len + 2 * (self.pad + 1) * self.ap.hop_length
        if len(wav) < need:
            wav = np.tile(wav, int(np.ceil(need / len(wav))))
        mel = self.ap.melspectrogram(wav).T.astype(np.float32)  # [T, n_mels]
        clip = (wav.astype(np.float32), mel)
        self._cache[idx] = clip
        if len(self._cache) > self.cache_clips:
            self._cache.popitem(last=False)
        return clip

    def __len__(self) -> int:
        return len(self.paths)

    def sample_batch(self, batch_size: int, rng: np.random.Generator):
        """Returns (mel [B, F+2*pad, n_mels], audio [B, seq_len])."""
        hop = self.ap.hop_length
        frames = self.seq_len // hop
        mels, audios = [], []
        for _ in range(batch_size):
            wav, mel = self._clip(int(rng.integers(len(self.paths))))
            max_start_f = mel.shape[0] - frames - 2 * self.pad - 1
            f0 = int(rng.integers(self.pad, max(self.pad + 1, max_start_f)))
            s0 = f0 * hop
            audios.append(wav[s0: s0 + self.seq_len])
            mels.append(mel[f0 - self.pad: f0 + frames + self.pad])
        return np.stack(mels), np.stack(audios)
