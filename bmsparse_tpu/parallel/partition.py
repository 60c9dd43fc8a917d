"""Block-row partitioning of the key space across a device mesh.

The reference is single-GPU; the multi-chip design (BASELINE.json north
star, SURVEY.md §5 "Distributed communication backend") partitions the
64-bit block-key space by block row: shard s owns all blocks with
``s * bpr <= brow < (s+1) * bpr``. Because keys are sorted row-major,
each shard owns a contiguous slice of every format array.

`ShardedBmSparse` carries the per-shard arrays stacked on a leading mesh
axis, padded to uniform sizes with the standard zero-bitmap identity
padding, so the whole container shards with a simple
``PartitionSpec('x')`` on axis 0.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..config import BLOCK_HEIGHT, round_up
from ..format.bmsparse import BmSparse, cdiv


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ShardedBmSparse:
    """BmSparse partitioned by block-row range into D uniform shards."""

    brow: jax.Array     # int32[D, nb_max]  (global block rows)
    bcol: jax.Array     # int32[D, nb_max]
    bmp_hi: jax.Array   # uint32[D, nb_max]
    bmp_lo: jax.Array   # uint32[D, nb_max]
    offsets: jax.Array  # int32[D, nb_max]  (shard-local value offsets)
    values: jax.Array   # dtype[D, nnz_max]
    nb: jax.Array       # int32[D] — valid blocks per shard

    num_rows: int = dataclasses.field(metadata=dict(static=True), default=0)
    num_cols: int = dataclasses.field(metadata=dict(static=True), default=0)
    # true global nnz; -1 = unknown (padded op results, e.g. sharded
    # SpGEMM output — to_bmsparse() recomputes the exact count)
    nnz: int = dataclasses.field(metadata=dict(static=True), default=0)
    transposed: bool = dataclasses.field(metadata=dict(static=True), default=False)
    # block rows owned per shard (uniform ranges)
    rows_per_shard: int = dataclasses.field(metadata=dict(static=True), default=0)

    @property
    def num_shards(self) -> int:
        return self.brow.shape[0]

    @property
    def nb_max(self) -> int:
        return self.brow.shape[1]

    @property
    def nnz_max(self) -> int:
        return self.values.shape[1]

    @property
    def block_rows(self) -> int:
        return cdiv(self.num_rows, BLOCK_HEIGHT)

    def shard_local(self, s: int) -> BmSparse:
        """Materialize shard s as a standalone padded BmSparse (debug)."""
        return BmSparse(
            brow=self.brow[s], bcol=self.bcol[s],
            bmp_hi=self.bmp_hi[s], bmp_lo=self.bmp_lo[s],
            offsets=self.offsets[s], values=self.values[s],
            nb=self.nb[s],
            num_rows=self.num_rows, num_cols=self.num_cols,
            nnz=self.nnz_max, transposed=self.transposed,
        )

    def to_bmsparse(self) -> BmSparse:
        """Reassemble the global matrix on host (inverse of `partition`)."""
        nbs = np.asarray(self.nb)
        parts = {
            k: np.asarray(getattr(self, k))
            for k in ("brow", "bcol", "bmp_hi", "bmp_lo", "offsets", "values")
        }
        browc, bcolc, hic, loc, offc, valc = [], [], [], [], [], []
        base = 0
        for s in range(self.num_shards):
            nb = int(nbs[s])
            if nb == 0:
                continue
            browc.append(parts["brow"][s][:nb])
            bcolc.append(parts["bcol"][s][:nb])
            hic.append(parts["bmp_hi"][s][:nb])
            loc.append(parts["bmp_lo"][s][:nb])
            offc.append(parts["offsets"][s][:nb] + base)
            # per-shard true value count = offsets[nb-1] + popcount(last bmp)
            hi64 = parts["bmp_hi"][s][nb - 1].astype(np.uint64)
            lo64 = parts["bmp_lo"][s][nb - 1].astype(np.uint64)
            last_cnt = bin(int((hi64 << np.uint64(32)) | lo64)).count("1")
            vcount = int(parts["offsets"][s][nb - 1]) + last_cnt
            valc.append(parts["values"][s][:vcount])
            base += vcount
        if not browc:
            z = np.zeros((0,), np.int32)
            return BmSparse(
                brow=jnp.asarray(z), bcol=jnp.asarray(z),
                bmp_hi=jnp.asarray(z.astype(np.uint32)),
                bmp_lo=jnp.asarray(z.astype(np.uint32)),
                offsets=jnp.asarray(z),
                values=jnp.zeros((0,), self.values.dtype),
                nb=jnp.int32(0),
                num_rows=self.num_rows, num_cols=self.num_cols, nnz=0,
                transposed=self.transposed,
            )
        values = np.concatenate(valc)
        return BmSparse(
            brow=jnp.asarray(np.concatenate(browc)),
            bcol=jnp.asarray(np.concatenate(bcolc)),
            bmp_hi=jnp.asarray(np.concatenate(hic)),
            bmp_lo=jnp.asarray(np.concatenate(loc)),
            offsets=jnp.asarray(np.concatenate(offc)),
            values=jnp.asarray(values),
            nb=jnp.int32(sum(len(x) for x in browc)),
            num_rows=self.num_rows, num_cols=self.num_cols,
            nnz=len(values), transposed=self.transposed,
        )


def partition(
    m: BmSparse, num_shards: int, align: int = 1
) -> ShardedBmSparse:
    """Split a BmSparse into `num_shards` uniform block-row ranges.

    Host-side preprocessing (runs once per matrix). Shard padding follows
    the zero-bitmap identity convention, so downstream kernels need no
    masks.

    align: round rows_per_shard up to this multiple (the tiered sharded
    plan needs align=16 so each shard's scalar-row base is a multiple of
    128 — see parallel/plan.py).
    """
    nb = int(m.nb)
    brow = np.asarray(m.brow)[:nb]
    bcol = np.asarray(m.bcol)[:nb]
    hi = np.asarray(m.bmp_hi)[:nb]
    lo = np.asarray(m.bmp_lo)[:nb]
    offsets = np.asarray(m.offsets)[:nb]
    values = np.asarray(m.values)
    counts = np.asarray(m.block_nnz())[:nb]

    bpr = round_up(cdiv(m.block_rows, num_shards), align)
    # contiguous slice bounds per shard (blocks sorted by brow)
    starts = np.searchsorted(brow, np.arange(num_shards) * bpr, side="left")
    ends = np.searchsorted(brow, (np.arange(num_shards) + 1) * bpr, side="left")
    nb_per = ends - starts
    nnz_per = np.array(
        [int(counts[s:e].sum()) for s, e in zip(starts, ends)], np.int64
    )
    nb_max = max(int(nb_per.max(initial=0)), 1)
    nnz_max = max(int(nnz_per.max(initial=0)), 1)

    sentinel = np.int32(m.block_rows)
    browS = np.full((num_shards, nb_max), sentinel, np.int32)
    bcolS = np.zeros((num_shards, nb_max), np.int32)
    hiS = np.zeros((num_shards, nb_max), np.uint32)
    loS = np.zeros((num_shards, nb_max), np.uint32)
    offS = np.zeros((num_shards, nb_max), np.int32)
    valS = np.zeros((num_shards, nnz_max), values.dtype)
    for s in range(num_shards):
        a, e = int(starts[s]), int(ends[s])
        k = e - a
        if k == 0:
            continue
        browS[s, :k] = brow[a:e]
        bcolS[s, :k] = bcol[a:e]
        hiS[s, :k] = hi[a:e]
        loS[s, :k] = lo[a:e]
        vbase = int(offsets[a])
        offS[s, :k] = offsets[a:e] - vbase
        offS[s, k:] = max(int(nnz_per[s]) - 1, 0)
        valS[s, : int(nnz_per[s])] = values[vbase : vbase + int(nnz_per[s])]

    return ShardedBmSparse(
        brow=jnp.asarray(browS), bcol=jnp.asarray(bcolS),
        bmp_hi=jnp.asarray(hiS), bmp_lo=jnp.asarray(loS),
        offsets=jnp.asarray(offS), values=jnp.asarray(valS),
        nb=jnp.asarray(nb_per.astype(np.int32)),
        num_rows=m.num_rows, num_cols=m.num_cols, nnz=m.nnz,
        transposed=m.transposed, rows_per_shard=bpr,
    )
