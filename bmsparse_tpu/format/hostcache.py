"""Host-side array cache for BmSparse containers.

The TPU runtime here is tunneled: device->host pulls cost ~25-40 MB/s
(plus a one-time ~minutes transfer-path setup), so any host-side
consumer of a container's arrays (generate_coo, plan building, binary
dumps) must never re-fetch data the host already had. The reference has
no such problem — its host pointers stay valid (ref:
src/bmSpMatrix.cu:320-363 pulls device vectors once per compare) — but
on this runtime a single stray np.asarray(values) costs more than the
whole benchmark budget.

Every producer that has the container's arrays on the host (the numpy
converter, the npz loader, a completed D2H pull) registers them here;
every host-side consumer asks here first. Keyed on container identity
with weakref eviction (same pattern as ops.plan._PLAN_CACHE): a plan is
value-bound, so a rebuilt container must never alias a dead entry.
"""

from __future__ import annotations

import weakref

import numpy as np

_CACHE: dict = {}


def put(m, **arrays) -> None:
    """Register host numpy arrays for container m.

    Recognized keys:
      coo          — (rows, cols, vals) triplets in any order, duplicates
                     already summed (the canonical decompressed content).
      brow, bcol, bmp_hi, bmp_lo, offsets, values
                   — the five format arrays (unpadded, length nb / nnz).
    """
    key = id(m)
    hit = _CACHE.get(key)
    if hit is not None and hit[0]() is m:
        hit[1].update(arrays)
        return
    try:
        ref = weakref.ref(m, lambda _r, k=key: _CACHE.pop(k, None))
    except TypeError:  # pragma: no cover - containers are weakref-able
        return
    _CACHE[key] = (ref, dict(arrays))


def get(m, name: str):
    """The cached host array (or tuple) for m, or None."""
    hit = _CACHE.get(id(m))
    if hit is None or hit[0]() is not m:
        return None
    return hit[1].get(name)


def fetch_format_arrays(m):
    """The five format arrays of m as host numpy (unpadded), from the
    cache when possible, via ONE device pull otherwise (the pull is then
    cached, so repeated host-side consumers pay it once)."""
    cached = get(m, "brow")
    if cached is not None:
        return tuple(
            get(m, k)
            for k in ("brow", "bcol", "bmp_hi", "bmp_lo", "offsets", "values")
        )
    nb = int(m.nb)
    arrays = dict(
        brow=np.asarray(m.brow)[:nb],
        bcol=np.asarray(m.bcol)[:nb],
        bmp_hi=np.asarray(m.bmp_hi)[:nb],
        bmp_lo=np.asarray(m.bmp_lo)[:nb],
        offsets=np.asarray(m.offsets)[:nb],
        values=np.asarray(m.values)[: m.nnz],
    )
    put(m, **arrays)
    return tuple(arrays[k] for k in (
        "brow", "bcol", "bmp_hi", "bmp_lo", "offsets", "values"))
