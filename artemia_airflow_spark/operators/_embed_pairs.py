"""Shared numpy kernels for embedding-cosine pair operators.

The cosine values must hash-match DuckDB's ``list_cosine_similarity``
after ROUND(..., 6), which accumulates dot product and norms
SEQUENTIALLY over the vector elements in double precision.  A plain
``numpy.dot``/BLAS matmul uses SIMD/pairwise summation — bitwise
DIFFERENT in the last ulps — so both kernels here accumulate with an
explicit loop over the dimension axis, vectorized across the pair
axis: per pair the operation order is exactly the left-fold
``((0 + a1*b1) + a2*b2) + ...``, per batch it is still a handful of
fused array ops.  Rounding itself stays on the Spark side
(``F.round`` = exact decimal HALF_UP, same as DuckDB; ``numpy.round``
is scaled half-even and can disagree near midpoints).
"""

from __future__ import annotations

import numpy as np


def seq_matrix(vecs) -> np.ndarray:
    """Stack a pandas Series of array<float> values to (n, dim) float64."""
    return np.stack([np.asarray(v, dtype="float64") for v in vecs])


def seq_norms(m: np.ndarray) -> np.ndarray:
    """Sequential-fold L2 norms per row (same order as the Catalyst
    ``l2_norm`` fold and DuckDB's accumulation)."""
    acc = np.zeros(m.shape[0])
    for i in range(m.shape[1]):
        acc = acc + m[:, i] * m[:, i]
    return np.sqrt(acc)


def seq_dot_block(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(n, dim) x (m, dim) -> (n, m) dot products, sequential over dim."""
    acc = np.zeros((a.shape[0], b.shape[0]))
    for i in range(a.shape[1]):
        acc = acc + a[:, i, None] * b[None, :, i]
    return acc


def seq_dot_pairs(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Row-aligned (n, dim) x (n, dim) -> (n,) dot products, sequential."""
    acc = np.zeros(a.shape[0])
    for i in range(a.shape[1]):
        acc = acc + a[:, i] * b[:, i]
    return acc
