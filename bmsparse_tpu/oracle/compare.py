"""Numerical verification — the reference's `bmSpMatrix::compare`
(ref: src/bmSpMatrix.cu:381-432) semantics:

  * both sides decompressed/sorted to (row, col, value) COO,
  * aligned with an offset-skip walk that tolerates extra explicit zeros in
    the oracle (ref: :405-407),
  * mean relative error with an epsilon = 1e-8 denominator clamp (ref: :403).

Unlike the reference (which always returns true, ref: :398,430) we return
the error and provide an asserting wrapper for tests.
"""

from __future__ import annotations

import numpy as np

EPSILON = 1e-8  # ref: src/bmSpMatrix.cu:403


def _to_coo_triplets(m) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    from ..format.bmsparse import BmSparse

    if isinstance(m, BmSparse):
        return m.generate_coo()
    import scipy.sparse as sp

    if sp.issparse(m):
        c = m.tocoo()
        order = np.lexsort((c.col, c.row))
        return (
            c.row[order].astype(np.int64),
            c.col[order].astype(np.int64),
            c.data[order].astype(np.float64),
        )
    a = np.asarray(m)
    r, c = np.nonzero(a)
    return r, c, a[r, c].astype(np.float64)


def mean_relative_error(result, oracle, verbose: bool = False) -> float:
    """Mean relative error of `result` vs `oracle` over aligned nonzeros.

    `oracle` may contain extra explicit zeros (cancellations the structural
    result keeps as stored zeros, or vice versa) — the alignment walk skips
    unmatched coordinates on either side, charging full error only when a
    *nonzero* coordinate is missing from the other operand, mirroring the
    reference's offset walk.
    """
    r1, c1, v1 = _to_coo_triplets(result)
    r2, c2, v2 = _to_coo_triplets(oracle)

    k1 = r1 * (1 << 31) + c1
    k2 = r2 * (1 << 31) + c2

    # Intersection via sorted merge.
    common, i1, i2 = np.intersect1d(k1, k2, return_indices=True)
    err = 0.0
    count = 0
    if len(common):
        a = v1[i1]
        b = v2[i2]
        denom = np.maximum(np.abs(b), EPSILON)
        rel = np.abs(a - b) / denom
        err += float(rel.sum())
        count += len(common)
        if verbose and len(rel):
            worst = int(np.argmax(rel))
            if rel[worst] > 1e-3:
                print(
                    f"largest error at ({r1[i1[worst]]}, {c1[i1[worst]]}): "
                    f"{a[worst]} vs {b[worst]} (rel {rel[worst]:.3e})"
                )
    # Coordinates only on one side: zero entries are tolerated (alignment
    # skip), true nonzeros count as full error.
    only1 = np.setdiff1d(np.arange(len(k1)), i1, assume_unique=True)
    only2 = np.setdiff1d(np.arange(len(k2)), i2, assume_unique=True)
    for vv, idx in ((v1, only1), (v2, only2)):
        nz = np.abs(vv[idx]) > EPSILON
        err += float(nz.sum())
        count += int(nz.sum())
    mre = err / max(count, 1)
    if verbose:
        print(f"Final: {mre}")  # ref prints "Final: <mean rel err>" (:429)
    return mre


def assert_allclose_sparse(result, oracle, tol: float = 1e-5, **kw) -> None:
    mre = mean_relative_error(result, oracle, **kw)
    assert mre <= tol, f"mean relative error {mre} > {tol}"
