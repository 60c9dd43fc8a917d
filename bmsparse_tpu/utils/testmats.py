"""Realistic sparse-structure generators for the benchmark suite.

The reference benchmarks against a SuiteSparse ssget mirror
(ref: spgemm_run_batch.sh:1-16) which is not downloadable in this
environment; these generators reproduce the three structural families
that dominate that collection so the planner's tier choices are
exercised on non-synthetic-looking structure:

  * fem2d     — P1 finite-element stiffness pattern on a structured
                triangulated grid: 7-point 2-D stencil (offsets 0, ±1,
                ±g, ±(g+1)); symmetric positive-diagonal values. The
                classic "banded but 2-D" matrix (DIA-tier friendly, with
                far diagonals).
  * roadnet   — planar-ish road network: low bounded degree, strong
                locality with occasional longer links (highways);
                near-symmetric. Exercises the SELL tier with small K and
                scattered single-nnz blocks.
  * webgraph  — power-law in-degree link graph (Zipf-distributed hub
                columns, locality-free). The adversarial skewed case for
                sigma-SELL chunk depths.

All return (rows, cols, vals) int32/int32/float32 COO, sorted row-major,
no duplicates.
"""

from __future__ import annotations

import numpy as np


def _dedup(rows, cols, n):
    key = np.unique(rows.astype(np.int64) * n + cols.astype(np.int64))
    return (key // n).astype(np.int32), (key % n).astype(np.int32)


def fem2d(grid: int, seed: int = 0):
    """P1 stiffness pattern on a grid x grid triangulated mesh
    (n = grid**2 rows)."""
    n = grid * grid
    rng = np.random.default_rng(seed)
    node = np.arange(n, dtype=np.int64)
    x = node % grid
    y = node // grid
    nbr_offs = [0, 1, -1, grid, -grid, grid + 1, -(grid + 1)]
    rows_l, cols_l = [], []
    for o in nbr_offs:
        c = node + o
        ok = (c >= 0) & (c < n)
        # forbid wrap-around across grid rows for the ±1 / ±(g+1) stencils
        if o in (1, grid + 1):
            ok &= x < grid - 1
        if o in (-1, -(grid + 1)):
            ok &= x > 0
        rows_l.append(node[ok])
        cols_l.append(c[ok])
    rows = np.concatenate(rows_l)
    cols = np.concatenate(cols_l)
    rows, cols = _dedup(rows, cols, n)
    # stiffness-like values: negative off-diagonal, dominant diagonal
    vals = np.where(
        rows == cols, 6.0 + rng.random(rows.shape[0]),
        -(0.5 + rng.random(rows.shape[0])),
    ).astype(np.float32)
    return rows, cols, vals, (n, n)


def roadnet(n: int, seed: int = 0):
    """Planar-ish road network: each node links to 2-4 nearby nodes plus
    ~0.5% longer-range 'highway' links; symmetrized."""
    rng = np.random.default_rng(seed)
    node = np.arange(n, dtype=np.int64)
    deg = rng.integers(2, 5, n)
    src = np.repeat(node, deg)
    # local links: offsets geometric-ish within a +-64 window
    off = (rng.geometric(0.08, src.shape[0]) * rng.choice(
        [-1, 1], src.shape[0]))
    dst = np.clip(src + off, 0, n - 1)
    # highways
    nh = max(n // 200, 1)
    hs = rng.integers(0, n, nh)
    hd = np.clip(hs + rng.integers(-n // 8, n // 8, nh), 0, n - 1)
    rows = np.concatenate([src, dst, hs, hd])
    cols = np.concatenate([dst, src, hd, hs])
    keep = rows != cols
    rows, cols = _dedup(rows[keep], cols[keep], n)
    vals = rng.random(rows.shape[0]).astype(np.float32) + 0.1
    return rows, cols, vals.astype(np.float32), (n, n)


def webgraph(n: int, avg_deg: int = 8, seed: int = 0):
    """Power-law link graph: out-edges from every page, targets drawn
    Zipf-like so a few hub columns are extremely dense."""
    rng = np.random.default_rng(seed)
    m = n * avg_deg
    src = rng.integers(0, n, m)
    # Zipf-ish targets via inverse-CDF of a truncated power law
    u = rng.random(m)
    dst = np.minimum((u ** 3.0) * n, n - 1).astype(np.int64)
    # permute hub ids so the dense columns are scattered, not clustered
    perm = rng.permutation(n)
    dst = perm[dst]
    keep = src != dst
    rows, cols = _dedup(src[keep], dst[keep], n)
    vals = rng.random(rows.shape[0]).astype(np.float32) + 0.01
    return rows, cols, vals.astype(np.float32), (n, n)
