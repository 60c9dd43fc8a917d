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
    # Halo exchange feasibility (plan-time, from the exact column
    # dependency structure): (halo_left, halo_right) scalar-column
    # counts, multiples of 128, covering EVERY shard's window into its
    # neighbours' v chunks. None = some shard needs more than one
    # neighbour's chunk (or a non-square layout) -> the all-gather path.
    halo: tuple | None = dataclasses.field(
        metadata=dict(static=True), default=None)

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
            sell_unit=8,
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
            sell_unit=8,
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
    # ---- halo feasibility: exact per-shard column windows ---------------
    from ..config import BLOCK_WIDTH, round_up

    chunk = round_up(round_up(sm.num_cols, BLOCK_WIDTH), 128 * d) // d
    npad_loc = bpr * BLOCK_HEIGHT
    halo = None
    if npad_loc >= chunk:  # square-ish layouts only (see dia col_shift)
        h_l = 0
        h_r = 0
        ok = True
        for s, lm in enumerate(locals_):
            own_lo, own_hi = s * chunk, (s + 1) * chunk
            lo, hi = own_lo, own_hi
            valid = np.asarray(lm.bmp_hi | lm.bmp_lo) != 0
            if valid.any():
                bc = np.asarray(lm.bcol)[valid]
                lo = min(lo, int(bc.min()) * BLOCK_WIDTH)
                hi = max(hi, (int(bc.max()) + 1) * BLOCK_WIDTH)
            if forced_dia:
                base = s * npad_loc
                lo = min(lo, base + min(forced_dia))
                hi = max(hi, base + npad_loc + max(forced_dia))
            h_l = max(h_l, own_lo - lo)
            h_r = max(h_r, hi - own_hi)
            if own_lo - lo > chunk or hi - own_hi > chunk:
                ok = False  # needs more than one neighbour chunk
        if ok:
            halo = (round_up(h_l, 128), round_up(h_r, 128))
            if halo[0] > chunk or halo[1] > chunk:
                halo = None

    return ShardedPrepared(
        sm=sm,
        dia=dia, dia_offsets=forced_dia,
        sell_dense=sell_dense, sell_bcol=sell_bcol,
        sell_ks=tuple(k for k, _ in forced_groups),
        out_gather=out_gather,
        sell_rows=plans[0].sell_rows if plans else 0,
        halo=halo,
    )
