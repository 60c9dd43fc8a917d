"""Sharded tiered execution plans — the multi-chip fast path.

The single-chip plan (ops/plan.py) makes static per-matrix choices
(which diagonals, which SELL K-groups). shard_map requires every shard to
run ONE program, so `prepare_sharded` unifies the static structure across
shards — the union of DIA offsets and of SELL K-groups, padded to the
per-group max chunk count — and stacks the per-shard plan arrays on a
leading mesh axis. Shards that lack a diagonal carry a zero strip; groups
a shard doesn't fill carry identity padding (zero tiles, sentinel column
indices), so no masking is needed in the compute.

Coordinates: rows are SHARD-LOCAL (shard s owns global block rows
[s*bpr, (s+1)*bpr)); columns stay GLOBAL — so the SELL tier gathers from
the all-gathered v directly, and the DIA tier keeps globally-shared
static diagonal offsets by passing the shard base as a traced col_shift
(see ops/spmv.py::dia_apply).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..config import BLOCK_HEIGHT
from ..ops.plan import _choose_diagonals, prepare
from .partition import ShardedBmSparse


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ShardedPrepared:
    """Stacked per-shard tiered plans with unified static structure."""

    sm: ShardedBmSparse
    # DIA tier: (D, nd, r_loc, 128); offsets are GLOBAL diagonals
    dia: jax.Array | None = None
    dia_offsets: tuple = dataclasses.field(
        metadata=dict(static=True), default=())
    # SELL tier: per group (D, 8, cap, K, 8, 128) / (D, cap*K*128)
    sell_dense: tuple = ()
    sell_bcol: tuple = ()
    sell_ks: tuple = dataclasses.field(metadata=dict(static=True), default=())
    out_gather: jax.Array | None = None   # (D, nbr_loc)
    sell_rows: int = dataclasses.field(metadata=dict(static=True), default=0)

    def __getattr__(self, name):
        return getattr(object.__getattribute__(self, "sm"), name)


def prepare_sharded(sm: ShardedBmSparse) -> ShardedPrepared:
    """Build per-shard plans with a unified static layout and stack them."""
    d = sm.num_shards
    bpr = sm.rows_per_shard
    if (bpr * BLOCK_HEIGHT) % 128:
        raise ValueError(
            "rows_per_shard*8 must be a multiple of 128 for the sharded "
            "plan (partition() aligns this; got bpr=%d)" % bpr
        )

    # local shard matrices: rows localized, columns global
    locals_ = []
    for s in range(d):
        lm = sm.shard_local(s)
        lm = dataclasses.replace(
            lm,
            brow=lm.brow - jnp.int32(s * bpr),
            num_rows=bpr * BLOCK_HEIGHT,
        )
        locals_.append(lm)

    # pass 1: union of per-shard diagonal choices (global offsets), capped
    # at MAX_DIAGS by shard vote (near-empty shards over-select; offsets
    # dropped here just fall back to those shards' SELL tier)
    from ..ops.plan import MAX_DIAGS

    votes: dict = {}
    for s, lm in enumerate(locals_):
        rows, cols, _ = lm.generate_coo()
        offs = _choose_diagonals(
            rows.astype(np.int64), cols.astype(np.int64),
            lm.num_rows, lm.num_cols, col_shift=s * bpr * BLOCK_HEIGHT,
        )
        for o in offs:
            votes[int(o)] = votes.get(int(o), 0) + 1
    keep = sorted(votes, key=lambda o: -votes[o])[:MAX_DIAGS]
    forced_dia = tuple(sorted(keep))

    # pass 2: per-shard plans with forced diagonals, collect exact group
    # requirements, then rebuild with the global forced grouping
    shard_plans_tmp = []
    group_need: dict = {}
    for s, lm in enumerate(locals_):
        p = prepare(
            lm,
            force_layout=(forced_dia, None),
            col_shift=s * bpr * BLOCK_HEIGHT,
        )
        shard_plans_tmp.append(p)
        counts_by_k: dict = {}
        for kg, dg in zip(p.sell_ks, p.sell_dense):
            counts_by_k[kg] = counts_by_k.get(kg, 0) + dg.shape[1]
        for k, c in counts_by_k.items():
            group_need[k] = max(group_need.get(k, 0), c)
    forced_groups = tuple(
        (k, group_need[k]) for k in sorted(group_need, reverse=True)
    )

    plans = [
        prepare(
            lm,
            force_layout=(forced_dia, forced_groups),
            col_shift=s * bpr * BLOCK_HEIGHT,
        )
        for s, lm in enumerate(locals_)
    ]

    def stack(get):
        arrs = [get(p) for p in plans]
        return jnp.stack(arrs) if arrs[0] is not None else None

    dia = stack(lambda p: p.dia) if forced_dia else None
    sell_dense = tuple(
        stack(lambda p, g=g: p.sell_dense[g]) for g in range(len(forced_groups))
    )
    sell_bcol = tuple(
        stack(lambda p, g=g: p.sell_bcol[g]) for g in range(len(forced_groups))
    )
    out_gather = (
        stack(lambda p: p.out_gather) if forced_groups
        else jnp.zeros((d, bpr), jnp.int32)
    )
    return ShardedPrepared(
        sm=sm,
        dia=dia, dia_offsets=forced_dia,
        sell_dense=sell_dense, sell_bcol=sell_bcol,
        sell_ks=tuple(k for k, _ in forced_groups),
        out_gather=out_gather,
        sell_rows=plans[0].sell_rows if plans else 0,
    )
