"""Eval metrics (reference utils/measures.py)."""

from __future__ import annotations

import numpy as np


def alignment_diagonal_score(alignments: np.ndarray, binary: bool = False) -> float:
    """Mean of per-step max attention weight — how diagonal/confident the
    alignment is (reference alignment_diagonal_score). alignments:
    [B, T_dec, T_in] or [T_dec, T_in]."""
    a = np.asarray(alignments)
    if a.ndim == 2:
        a = a[None]
    m = a.max(axis=-1)  # [B, T_dec]
    if binary:
        m = (m > 0.5).astype(np.float64)
    return float(m.mean())
