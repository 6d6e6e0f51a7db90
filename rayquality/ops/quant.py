"""Shared fixed-point quantization kernels.

Every money/score column that participates in a value-hashed oracle
comparison is quantized to integer cents (or micro-units) on BOTH sides so
float summation order can never flip a hash. The rounding rule must also
match: DuckDB ``ROUND`` is half-AWAY-FROM-ZERO, while ``np.round`` /
``pc.round`` default to banker's half-to-even — a value landing exactly on
.5 (e.g. 0.125 * 100) would round differently per side. These helpers pin
half-away-from-zero everywhere.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def quantize_i64(x: np.ndarray, scale: float = 100.0) -> np.ndarray:
    """``round(x * scale)`` as int64, half away from zero (DuckDB ROUND)."""
    v = np.asarray(x, dtype=np.float64) * scale
    return (np.sign(v) * np.floor(np.abs(v) + 0.5)).astype(np.int64)


def cents_np(x: np.ndarray) -> np.ndarray:
    return quantize_i64(x, 100.0)


def cents_pa(col: pa.ChunkedArray | pa.Array, scale: float = 100.0) -> pa.Array:
    """Arrow variant: half_towards_infinity == half away from zero."""
    return pc.cast(
        pc.round(pc.multiply(col, scale), round_mode="half_towards_infinity"),
        pa.int64(),
    )
