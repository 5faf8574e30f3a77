"""Data pipeline tests (reference tests/test_loader.py + test_preprocessors.py
patterns) over a generated synthetic corpus."""

import numpy as np
import pytest

from your_voice_tts_tpu.audio import AudioProcessor
from your_voice_tts_tpu.config import AudioConfig, Config, DataConfig, DatasetConfig
from your_voice_tts_tpu.data import TTSDataset, load_meta_data
from your_voice_tts_tpu.data.formatters import ljspeech
from your_voice_tts_tpu.data.synthetic import make_synthetic_corpus
from your_voice_tts_tpu.utils.speakers import parse_speakers, save_speaker_mapping, load_speaker_mapping

SMALL_AUDIO = AudioConfig(sample_rate=8000, fft_size=256, hop_length=64,
                          win_length=256, num_mels=20, mel_fmax=None,
                          do_trim_silence=False)
R = 2


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    path = tmp_path_factory.mktemp("syncorp")
    make_synthetic_corpus(str(path), n_items=12, sr=8000, n_speakers=2)
    return str(path)


@pytest.fixture(scope="module")
def cfg(corpus):
    return Config(
        audio=SMALL_AUDIO,
        data=DataConfig(
            datasets=(DatasetConfig(name="synthetic", path=corpus,
                                    meta_file_train="metadata.csv"),),
            min_seq_len=3, max_seq_len=200, batch_group_size=2,
        ),
    )


@pytest.fixture(scope="module")
def dataset(cfg, corpus):
    ap = AudioProcessor(cfg.audio)
    items, _ = load_meta_data(cfg.data.datasets, eval_split=False)
    return TTSDataset(items, cfg, ap)


def test_formatter(corpus):
    items = ljspeech(corpus, "metadata.csv")
    assert len(items) == 12
    text, wav, speaker = items[0]
    assert wav.endswith(".wav")
    assert len(text) > 0


def test_dataset_entries_sorted(dataset):
    lens = [e["mel_len"] for e in dataset.entries]
    assert lens == sorted(lens)
    assert len(dataset) > 0


def test_batch_shapes_and_padding(dataset):
    batches = list(dataset.batches(batch_size=4, r=R, shuffle=False))
    assert len(batches) == int(np.ceil(len(dataset) / 4))
    for b in batches:
        B, Tt = b["text"].shape
        assert B == 4
        assert Tt % 8 == 0
        Bm, Tm, n_mels = b["mel"].shape
        assert Tm % (R * 8) == 0 and n_mels == 20
        assert b["stop_targets"].shape == (B, Tm // R)
        # padded text region is zeros
        for i in range(int(b["n_real"])):
            L = b["text_lengths"][i]
            assert np.all(b["text"][i, L:] == 0)
            M = b["mel_lengths"][i]
            assert np.all(b["mel"][i, M:] == 0)
            # stop target fires exactly at the last valid decoder step
            steps = int(np.ceil(M / R))
            assert b["stop_targets"][i, steps - 1] == 1.0
            if steps >= 2:
                assert b["stop_targets"][i, steps - 2] == 0.0


def test_bucket_shapes_bounded(dataset):
    shapes = {(b["text"].shape[1], b["mel"].shape[1])
              for b in dataset.batches(batch_size=4, r=R, shuffle=False)}
    # bucketing must collapse shape diversity
    assert len(shapes) <= 3


def test_speaker_ids(dataset):
    assert len(dataset.speakers) == 2
    b = next(dataset.batches(batch_size=4, r=R, shuffle=False))
    assert set(np.unique(b["speaker_ids"])) <= {0, 1}


def test_mel_matches_audioprocessor(dataset, cfg):
    ap = AudioProcessor(cfg.audio)
    e = dataset.entries[0]
    wav = ap.load_wav(e["wav"])
    mel = ap.melspectrogram(wav).T
    np.testing.assert_allclose(e["mel"], mel, atol=1e-6)


def test_mel_disk_cache(cfg, corpus, tmp_path):
    ap = AudioProcessor(cfg.audio)
    items, _ = load_meta_data(cfg.data.datasets, eval_split=False)
    ds1 = TTSDataset(items[:3], cfg, ap, cache_dir=str(tmp_path))
    import os
    n_files = len([f for f in os.listdir(tmp_path) if f.endswith(".npy")])
    assert n_files == len(ds1)
    ds2 = TTSDataset(items[:3], cfg, ap, cache_dir=str(tmp_path))
    np.testing.assert_allclose(ds1.entries[0]["mel"], ds2.entries[0]["mel"])


def test_speaker_mapping_roundtrip(tmp_path):
    mapping = {"spk_a": 0, "spk_b": 1}
    save_speaker_mapping(str(tmp_path), mapping)
    loaded = load_speaker_mapping(str(tmp_path))
    assert loaded == mapping
    ids, emb = parse_speakers(loaded)
    assert ids == mapping and emb is None


def test_parse_dvector_speakers():
    mapping = {"alice": {"clip1": {"embedding": [1.0, 0.0]},
                         "clip2": {"embedding": [0.0, 1.0]}},
               "bob": {"c": {"embedding": [2.0, 2.0]}}}
    ids, emb = parse_speakers(mapping)
    assert set(ids) == {"alice", "bob"}
    np.testing.assert_allclose(emb["alice"], [0.5, 0.5])


def test_min_max_seq_len_filter(cfg, corpus):
    ap = AudioProcessor(cfg.audio)
    items, _ = load_meta_data(cfg.data.datasets, eval_split=False)
    import dataclasses
    tight = dataclasses.replace(cfg, data=dataclasses.replace(
        cfg.data, min_seq_len=30, max_seq_len=60))
    ds = TTSDataset(items, tight, ap)
    assert all(30 <= len(e["seq"]) <= 60 for e in ds.entries)
    assert len(ds) < len(items)


def test_preprocess_audit_cli(tmp_path):
    """`preprocess --audit` validates a corpus with pure host work: clean
    corpora report no problems; corrupt wavs and empty texts are named
    (VERDICT r2 next #10)."""
    from your_voice_tts_tpu.bin.preprocess import audit
    from your_voice_tts_tpu.config import load_config
    from your_voice_tts_tpu.data.synthetic import make_synthetic_corpus

    corpus = str(tmp_path / "c")
    make_synthetic_corpus(corpus, n_items=6, sr=8000, n_speakers=2)
    cfg = load_config("configs/smoke_synthetic.json")
    import dataclasses
    ds = dataclasses.replace(cfg.data.datasets[0], path=corpus)
    cfg = dataclasses.replace(cfg,
                              data=dataclasses.replace(cfg.data, datasets=(ds,)))
    report = audit(cfg)
    assert report["problems"] == []
    assert report["speakers"] == 2
    assert report["rows"] == 6
    assert report["audio_hours"] > 0

    # corrupt one wav + blank one text -> named problems, nonzero exit
    import os
    wavs = sorted(os.listdir(os.path.join(corpus, "wavs")))
    with open(os.path.join(corpus, "wavs", wavs[0]), "wb") as f:
        f.write(b"not a wav")
    meta = os.path.join(corpus, "metadata.csv")
    lines = open(meta).read().splitlines()
    parts = lines[1].split("|")
    lines[1] = f"{parts[0]}| | "
    open(meta, "w").write("\n".join(lines) + "\n")
    report2 = audit(cfg)
    assert len(report2["problems"]) == 2
    assert any("unreadable" in s for s in report2["problems"])
    assert any("empty text" in s for s in report2["problems"])


def test_words_cycle_corpus_fixed_shapes(tmp_path):
    """words_cycle mode (the multi-host test's corpus): item i gets exactly
    words_cycle[i % len] words with ONE fixed sentence and duration per
    group — so a round-robin shard is single-bucket while different shards
    differ."""
    import wave

    path = str(tmp_path / "cyc")
    make_synthetic_corpus(path, n_items=8, sr=8000, words_cycle=(3, 8))
    rows = [l.split("|") for l in
            open(f"{path}/metadata.csv").read().splitlines()]
    texts = [r[1] for r in rows]
    # one fixed text per parity group, differing across groups
    assert len(set(texts[0::2])) == 1 and len(set(texts[1::2])) == 1
    assert texts[0] != texts[1]
    assert len(texts[1].split()) == 8 and len(texts[0].split()) == 3
    frames = []
    for r in rows[:4]:
        with wave.open(f"{path}/wavs/{r[0]}.wav") as f:
            frames.append(f.getnframes())
    # fixed duration per group (no jitter), longer for more words
    assert frames[0] == frames[2] and frames[1] == frames[3]
    assert frames[1] > frames[0]


def test_phoneme_disk_cache(tmp_path, monkeypatch):
    """With cache_dir + use_phonemes, phonemizations persist to disk and a
    second dataset construction reuses them without calling G2P."""
    import dataclasses

    from your_voice_tts_tpu.audio import AudioProcessor
    from your_voice_tts_tpu.config import load_config
    from your_voice_tts_tpu.data.dataset import TTSDataset
    from your_voice_tts_tpu.data.formatters import synthetic
    from your_voice_tts_tpu.data.synthetic import make_synthetic_corpus

    corpus = str(tmp_path / "corpus")
    make_synthetic_corpus(corpus, n_items=4, sr=8000)
    cfg = load_config("configs/smoke_synthetic.json")
    cfg = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, use_phonemes=True,
                                      min_seq_len=1))
    ap = AudioProcessor(cfg.audio)
    items = synthetic(corpus)
    cache = str(tmp_path / "cache")

    ds1 = TTSDataset(items, cfg, ap, cache_dir=cache)
    ph_files = list((tmp_path / "cache" / "phonemes").glob("*.npy"))
    assert len(ph_files) == 4

    import your_voice_tts_tpu.data.dataset as dsmod

    def boom(*a, **k):
        raise AssertionError("G2P recomputed despite a warm phoneme cache")

    monkeypatch.setattr(dsmod, "phoneme_to_sequence", boom)
    ds2 = TTSDataset(items, cfg, ap, cache_dir=cache)
    assert [e["seq"].tolist() for e in ds2.entries] == \
        [e["seq"].tolist() for e in ds1.entries]


def test_unknown_speaker_raises(tmp_path):
    """An externally-passed speaker mapping missing a corpus speaker must
    raise, not alias the utterances onto speaker id 0."""
    import dataclasses

    import pytest

    from your_voice_tts_tpu.audio import AudioProcessor
    from your_voice_tts_tpu.config import load_config
    from your_voice_tts_tpu.data.dataset import TTSDataset
    from your_voice_tts_tpu.data.formatters import synthetic
    from your_voice_tts_tpu.data.synthetic import make_synthetic_corpus

    corpus = str(tmp_path / "corpus")
    make_synthetic_corpus(corpus, n_items=6, sr=8000, n_speakers=2)
    cfg = load_config("configs/smoke_synthetic.json")
    cfg = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, min_seq_len=1))
    ap = AudioProcessor(cfg.audio)
    ds = TTSDataset(synthetic(corpus), cfg, ap,
                    speakers={"SYN00": 0})  # SYN01 missing
    with pytest.raises(KeyError, match="missing from the speaker mapping"):
        next(iter(ds.batches(batch_size=2, r=2)))


def test_token_batching_invariants_and_fill(tmp_path):
    """tokens_per_batch batches satisfy B_shape * T_mel <= budget (single
    over-budget rows excepted), B_shape is a quantum multiple, every item
    appears exactly once, and mel fill beats fixed-B on a long-tailed
    corpus."""
    import dataclasses

    path = str(tmp_path / "longtail")
    make_synthetic_corpus(path, n_items=96, sr=8000,
                          words_cycle=(2, 3, 4, 5, 6, 8, 10, 12, 14, 16))
    cfg = Config(
        audio=SMALL_AUDIO,
        data=DataConfig(
            datasets=(DatasetConfig(name="synthetic", path=path,
                                    meta_file_train="metadata.csv"),),
            min_seq_len=1, max_seq_len=10**9, batch_group_size=2,
        ),
    )
    items, _ = load_meta_data(cfg.data.datasets, eval_split=False)
    ap = AudioProcessor(cfg.audio)
    fixed = TTSDataset(items, cfg, ap)

    def fill(batches):
        real = padded = 0
        seen = 0
        for b in batches:
            real += int(np.sum(b["mel_lengths"]))
            padded += b["mel"].shape[0] * b["mel"].shape[1]
            seen += int(b["n_real"])
        return real / padded, seen

    TOKENS = 16 * 512
    tok_cfg = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, tokens_per_batch=TOKENS))
    tok = TTSDataset(items, tok_cfg, ap)

    shapes = set()
    n_seen = 0
    for b in tok.batches(64, R, shuffle=True, seed=1):
        B, T = b["mel"].shape[0], b["mel"].shape[1]
        shapes.add((B, T))
        assert B % TTSDataset._B_QUANTUM == 0, (B, T)
        assert B <= 64, B
        n_real = int(b["n_real"])
        assert B * T <= TOKENS or n_real == 1, (B, T, n_real)
        n_seen += n_real
    assert n_seen == len(items)
    assert len(shapes) > 1, "long-tailed corpus should produce varied shapes"

    fill_fixed, seen_fixed = fill(fixed.batches(64, R, shuffle=True, seed=1))
    fill_tok, seen_tok = fill(tok.batches(64, R, shuffle=True, seed=1))
    assert seen_fixed == seen_tok == len(items)
    assert fill_tok > fill_fixed, (fill_tok, fill_fixed)


@pytest.mark.slow  # ~10 s: one train-step compile per (B, T) shape
def test_token_batching_trains_end_to_end(tmp_path):
    """The trainer consumes variable-(B, T) token batches through real fit
    steps (one compile per shape; finite loss; params move)."""
    import dataclasses

    import jax

    from your_voice_tts_tpu.config import load_config
    from your_voice_tts_tpu.train.trainer import Trainer

    path = str(tmp_path / "corpus")
    make_synthetic_corpus(path, n_items=16, sr=8000, words_cycle=(3, 8))
    cfg = load_config("configs/smoke_synthetic.json")
    ds = dataclasses.replace(cfg.data.datasets[0], path=path)
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(cfg.data, datasets=(ds,),
                                 tokens_per_batch=8 * 96),
        training=dataclasses.replace(cfg.training, batch_size=8, epochs=1,
                                     run_eval=False))
    trainer = Trainer(cfg, output_path=None, verbose=False)
    p0 = np.asarray(jax.tree_util.tree_leaves(trainer.state.params)[0]).copy()
    metrics = trainer.fit(max_steps=3)
    assert np.isfinite(metrics["loss"])
    p1 = np.asarray(jax.tree_util.tree_leaves(trainer.state.params)[0])
    assert np.abs(p1 - p0).max() > 0.0
