"""Rounding helpers shared by engine kernels and SQL-gated query emitters.

The driver's correctness gate hashes emitted values, so every rounded
statistic must follow the SAME rule as the DuckDB oracle.  DuckDB's
``round()`` is half-AWAY-from-zero; ``np.round`` / Python ``round`` are
half-EVEN, and the two rules disagree exactly on dyadic .5e-6 boundaries
— which real statistics do hit (measured: a cusum range of 387.3640625
at sf0.01 flipped a gate).
"""

from __future__ import annotations

import numpy as np


def round6_half_away(x):
    """Round to 6 decimals half-away-from-zero (DuckDB's rule).

    Sign-aware (works for negative statistics: mean diffs, t stats, MMR
    scores).  floor(|x|·1e6 + 0.5) is exact for the dyadic boundary cases
    (boundary × 1e6 fits 53 bits)."""
    x = np.asarray(x, dtype=np.float64)
    return np.sign(x) * np.floor(np.abs(x) * 1e6 + 0.5) / 1e6
