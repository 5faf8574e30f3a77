"""Speaker mapping persistence (reference utils/speakers.py).

speakers.json maps speaker name -> integer id (lookup-table mode) or
speaker name -> {clip: embedding} (external d-vector mode from the
speaker encoder's compute_embeddings; SURVEY.md SS3.5).
"""

from __future__ import annotations

import json
import os

import numpy as np


def save_speaker_mapping(out_path: str, speaker_mapping: dict) -> None:
    path = os.path.join(out_path, "speakers.json") if os.path.isdir(out_path) else out_path
    with open(path, "w", encoding="utf-8") as f:
        json.dump(speaker_mapping, f, indent=2)


def load_speaker_mapping(path: str) -> dict:
    if os.path.isdir(path):
        path = os.path.join(path, "speakers.json")
    with open(path, encoding="utf-8") as f:
        return json.load(f)


def parse_speakers(mapping: dict):
    """Split a speakers.json into (name->id, name->mean d-vector or None)."""
    if not mapping:
        return {}, None
    first = next(iter(mapping.values()))
    if isinstance(first, int):
        return dict(mapping), None
    # d-vector mode: {speaker: {clip: {"embedding": [...]}}} or {speaker: [..]}
    ids = {name: i for i, name in enumerate(sorted(mapping))}
    embeddings = {}
    for name, val in mapping.items():
        if isinstance(val, dict):
            vecs = []
            for clip in val.values():
                vec = clip["embedding"] if isinstance(clip, dict) else clip
                vecs.append(np.asarray(vec, np.float32))
            embeddings[name] = np.mean(vecs, axis=0)
        else:
            embeddings[name] = np.asarray(val, np.float32)
    return ids, embeddings
