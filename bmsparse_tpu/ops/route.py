"""Stream tier: gather-free SpMV for scattered structures (round 4).

The reference covers webgraph-like matrices with its one gather kernel —
on a GPU, random v reads ride the L2 at device gather speed
(ref: src/bmSparse_SPMV.cu:84-189). TPUs have no gather hardware: XLA
dynamic takes cost ~0.14-0.3 G idx/s (measured, scratch/exp_gather.json)
which capped web256k at 0.27 Gnnz/s through round 3. This module
replaces the per-slot gather entirely:

  1. PRODUCTS in column order. Scalar nnz are sorted by column at plan
     time, so every 8x128 tile's sources sit in one narrow v window; the
     Pallas window_product kernel DMAs the window once and resolves each
     lane with an in-register quarter-select (measured 27 G idx/s — two
     orders of magnitude over XLA takes). The within-window slot order
     is chosen so each element's LANE already equals its destination
     lane — the first routing stage costs nothing.
  2. A STATIC ROUTING NETWORK delivers every product to its destination
     cell (k, row) of a natural-row-order SELL grid. Destinations are
     plan-time constants, so the movement decomposes into two in-register
     lane-shuffle stages (ops/pallas/shuffle_kernel.rowwise_gather)
     bridged by XLA transposes — a Benes-style network at HBM-stream
     cost. Collisions (two elements wanting the same slack slot) are
     resolved at plan time; the few that do not fit (<1%) fall back to
     one small XLA gather + segment_sum.
  3. u = dense sum over the K axis — no scatter, no final permutation
     (the grid is in natural row order).

Everything data-dependent happens once in prepare(); the per-call op is
three Pallas launches, two transposes, and dense sums.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from .pallas.shuffle_kernel import rowwise_gather, window_product

W_STREAM = 1024        # v window width (scalars); 8 quarter selects
S2 = 4                 # stage-2 slack slots per (sub-row, dest lane)
# Stage-3 slack (round 5c): with nq padded to a multiple of 128 the
# destination a = krank * (nq/128) + (row//128)//128 decomposes UNIQUELY
# into (krank, row-digit) — two elements share (slab, a) only if they
# share the row AND the krank, which is impossible (kranks are distinct
# within a row). Stage 3 is collision-free by construction, so one slot
# suffices: s3=2 was pure waste (it doubled the idx3/a3 HBM traffic and
# the stage-3 quarter-select chain — the tier's largest compute term).
S3 = 1
TILE_R = 32            # window_product rows per grid step (panel quota
#                        granularity; 8-row steps measured step-bound)
EXTRA_ROWS = 4         # per-window-group row quota beyond ceil(m/128)
K_CAP = 64             # rows with more slots go to the block-SELL tier


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class StreamPlan:
    """Static routing plan for one matrix's scattered slots."""

    vals_grid: jax.Array        # (R1, 128) coefficients, source order
    rel_grid: jax.Array         # (R1, 128) int32 window-relative cols
    ws: jax.Array               # (R1//8,) int32 window starts (aligned)
    pp: jax.Array               # (R1//8,) int32 panel ordinal per tile
    nxt: jax.Array              # (R1//8,) int32 first tile of next panel
    idx2: jax.Array             # (R2, S2, 128) int32 stage-2 tables
    idx3: jax.Array             # (R3, G3, 128) int32 stage-3 tables
    res_rows: jax.Array         # (nres,) int32 fallback rows (sorted)
    res_cols: jax.Array         # (nres,) int32
    res_vals: jax.Array         # (nres,)
    w: int = dataclasses.field(metadata=dict(static=True), default=W_STREAM)
    k: int = dataclasses.field(metadata=dict(static=True), default=0)
    nq: int = dataclasses.field(metadata=dict(static=True), default=0)
    nsub: int = dataclasses.field(metadata=dict(static=True), default=0)
    w3: int = dataclasses.field(metadata=dict(static=True), default=0)
    nahi: int = dataclasses.field(metadata=dict(static=True), default=0)
    vtab_len: int = dataclasses.field(metadata=dict(static=True), default=0)
    n_rows: int = dataclasses.field(metadata=dict(static=True), default=0)


def stream_cost_estimate(
    nnz: int, k: int, n_rows: int, s2: int = S2, s3: int = S3,
) -> float:
    """Estimated per-SpMV seconds of the stream tier. Three measured v5e
    cost components (round-5 stage profile, scratch/scatter_tpu2.out):
    HBM bytes at 819 GB/s, Pallas grid-step overhead (~0.5 us per step
    at 32-row tiles), and the stage-3 quarter-select compute (~10 ns per
    (8-row block, output vreg, 128-lane quarter) unit — the term that
    disqualifies deep/wide structures: road1M measured 13.6 ms routed
    here vs 3.0 ms on its block tiers before this term existed).
    Used by ops/plan.prepare to route between the block SELL tiers and
    this tier."""
    BW = 819e9
    STEP = 0.5e-6
    QSEL = 10e-9
    nq = -(-(-(-n_rows // 128)) // 128) * 128  # padded (see S3 note)
    r1 = 1.45 * max(nnz, 1) / 128 + TILE_R     # quota slack + padding
    nsub = max(r1 / 128, 1)
    nahi = max(-(-(-(-(k * nq) // 128)) // 128), 1)
    g3 = nahi * s3
    w3 = -(-nsub * s2 // 128) * 128
    grids = r1 * 128 * 8                       # vals + rel
    idx2 = r1 * 128 * s2 * 4
    idx3 = 16384 * g3 * 128 * 4
    transients = 6 * r1 * 128 * 4              # t1/a2/x3/a3 reads+writes
    t_bytes = (grids + idx2 + idx3 + transients) / BW
    t_steps = (r1 / TILE_R * 0.4e-6            # window_product tiles
               + r1 / 32 * STEP                # stage-2 gather steps
               + 16384 / 32 * STEP)            # stage-3 gather steps
    t_qsel = (16384 / 8) * g3 * (w3 / 128) * QSEL
    return t_bytes + t_steps + t_qsel


def build_stream_plan(
    rows: np.ndarray, cols: np.ndarray, vals: np.ndarray,
    n_rows: int, n_cols: int, np_dtype=np.float32,
    s2: int = S2, s3: int = S3,
) -> StreamPlan:
    """Plan-time construction (host numpy, once per matrix).

    rows/cols are SCALAR coordinates; every row must have <= K_CAP
    entries (the caller routes heavier rows to the block-SELL tier).
    s2/s3 override the default slack factors: locally-clustered
    structures (road networks) collide in the stage-2/3 tables far more
    than webgraphs — the caller escalates slack until the residue is
    small (the tables grow linearly with slack).
    """
    nnz = len(rows)
    rows = rows.astype(np.int64)
    cols = cols.astype(np.int64)
    vals = vals.astype(np_dtype)

    # ---- destination cells: (k, row) of a (K, nq*128) grid ------------
    o = np.lexsort((cols, rows))
    rows, cols, vals = rows[o], cols[o], vals[o]
    krank = np.arange(nnz) - np.searchsorted(rows, rows)
    kmax = int(krank.max()) + 1 if nnz else 1
    assert kmax <= K_CAP, kmax
    # Depth cap (round 5b): the grid's K axis is sized by the DEEPEST
    # stream row, but the stage-3 tables and the final K-sum are billed
    # on every row — web256k's kmax=23 tail (p99 depth is 15) forced
    # nahi=3 where depth 16 fits nahi=2, ~70 MB of idx3/a3 traffic and
    # a third of the quarter-select compute for 0.08% of the elements.
    # Pick the cap by the same cost model that routes matrices here:
    # table cost at depth k plus residue cost for the overflow ranks.
    k = kmax
    if nnz:
        depth = np.bincount(rows)
        depth = depth[depth > 0]
        RES_NS = 11.5e-9
        best, best_cost = kmax, None
        for kc in range(max(int(np.percentile(depth, 90)), 1), kmax + 1):
            ovf = int(np.maximum(depth - kc, 0).sum())
            cost = stream_cost_estimate(
                nnz - ovf, kc, n_rows, s2, s3) + ovf * RES_NS
            if best_cost is None or cost < best_cost:
                best, best_cost = kc, cost
        k = best
    deep = krank >= k
    deep_rows = rows[deep].astype(np.int32)
    deep_cols = cols[deep].astype(np.int32)
    deep_vals = vals[deep]
    if deep.any():
        rows, cols, vals = rows[~deep], cols[~deep], vals[~deep]
        krank = krank[~deep]
        nnz = len(rows)
    # nq padded to a multiple of 128: b = dr % 128 then depends on the
    # row alone and a = dr // 128 = krank*(nq/128) + (row//128)//128
    # decomposes uniquely -> stage 3 is collision-free at s3 = 1 (the
    # S3 note above). Costs k * pad * 512 bytes of all-zero grid rows.
    nq = -(-(-(-n_rows // 128)) // 128) * 128
    dr = krank * np.int64(nq) + rows // 128      # dest row in (k*nq, 128)
    dl = (rows % 128).astype(np.int64)           # dest lane
    a = dr // 128
    b = dr % 128
    a_count = -(-(k * nq) // 128)      # distinct a values
    nahi = max(-(-a_count // 128), 1)
    ahi = (a // 128).astype(np.int64)
    amod = (a % 128).astype(np.int64)

    # ---- source packing: column windows, lane = dest lane -------------
    co = np.argsort(cols, kind="stable")
    # group boundaries: greedy windows of W_STREAM scalars, 128-aligned
    ws_of_group: list = []
    sorted_cols = cols[co]
    # vectorized greedy cut: a new group starts where col >= current end.
    starts = []
    i = 0
    while i < nnz:
        # w-ALIGNED panel starts: the window_product DMA needs a lane
        # offset provably divisible by 128 in the sublane-tiled v table,
        # i.e. ws divisible by W_STREAM (see shuffle_kernel, round 5)
        ws = int(sorted_cols[i]) // W_STREAM * W_STREAM
        starts.append(i)
        ws_of_group.append(ws)
        i = int(np.searchsorted(sorted_cols, ws + W_STREAM, side="left"))
    starts.append(nnz)
    ngroups = len(ws_of_group)

    r1_of = np.full((nnz,), -1, np.int64)
    lane_of = dl[co]
    row_base = 0
    tile_ws = []
    tile_pp = []
    res_mask = np.zeros((nnz,), bool)
    for gi in range(ngroups):
        s, e = starts[gi], starts[gi + 1]
        m = e - s
        lanes = lane_of[s:e]
        # Row quota from the group's actual WORST lane, not the mean:
        # round 4's ceil(m/128)+4 left every lane beyond mean+4 in the
        # residue (web256k: 25.7k of its 31k residue elements). Exact
        # max costs +23% grid rows on web256k and zeroes the stage-1
        # residue; a cap keeps one pathological hot lane (hub rows
        # sharing row%128 inside one window) from padding the whole
        # group's rows — its tail overflows to the residue as before.
        maxlane = int(np.bincount(lanes, minlength=128).max()) if m else 0
        quota = min(maxlane, 2 * (-(-m // 128)) + 4 * EXTRA_ROWS)
        # rounded to the kernel's TILE_R-row grid step (all of a step's
        # rows must share one window panel)
        quota = max(-(-quota // TILE_R) * TILE_R, TILE_R)
        # j-th slot of each lane -> row j (within the group)
        order = np.lexsort((np.arange(m), lanes))
        ranks = np.empty((m,), np.int64)
        ranks[order] = np.arange(m) - np.searchsorted(
            lanes[order], lanes[order])
        ok = ranks < quota
        r1_of[s:e] = np.where(ok, row_base + ranks, -1)
        res_mask[s:e] = ~ok
        row_base += quota
        tile_ws.extend([ws_of_group[gi]] * (quota // TILE_R))
        tile_pp.extend([gi] * (quota // TILE_R))
    r1_count = row_base
    # nsub rounded so nsub*s2 is a multiple of 128: stage-3's x3 width
    # then equals w3 exactly and stream_apply's pad-concat (a full copy
    # of the 16384-row stage-3 operand) vanishes. Costs a few all-zero
    # pad rows (web256k: +8.5%), which join the final zero-window panel.
    nsub_mult = 128 // np.gcd(s2, 128)
    nsub = -(-max(-(-r1_count // 128), 1) // nsub_mult) * nsub_mult
    r1_pad = nsub * 128
    # extend to the padded row count (padding tiles form one final
    # panel with an all-zero window at 0)
    npanel = (tile_pp[-1] + 1) if tile_pp else 0
    pad_tiles = r1_pad // TILE_R - len(tile_ws)
    tile_ws.extend([0] * pad_tiles)
    tile_pp.extend([npanel] * pad_tiles)
    # first tile of the NEXT panel per tile (the tile's own index when
    # it belongs to the last panel) — drives the kernel's one-DMA-per-
    # panel double buffering
    tpp = np.asarray(tile_pp, np.int64)
    ntiles = len(tpp)
    changes = np.nonzero(np.diff(tpp))[0] + 1        # first tile per panel
    starts_of_panel = np.concatenate([[0], changes])
    nxt = np.empty((ntiles,), np.int64)
    for pi, s0 in enumerate(starts_of_panel):
        e0 = starts_of_panel[pi + 1] if pi + 1 < len(starts_of_panel) \
            else ntiles
        nxt[s0:e0] = e0 if pi + 1 < len(starts_of_panel) else s0
    # a tile in the last panel points at itself -> kernel skips prefetch
    nxt = np.minimum(nxt, ntiles - 1)
    nxt[tpp == tpp[-1]] = np.arange(ntiles)[tpp == tpp[-1]]

    # scatter coefficients / relative columns into the source grid
    vals_grid = np.zeros((r1_pad, 128), np_dtype)
    rel_grid = np.zeros((r1_pad, 128), np.int32)
    okm = r1_of >= 0
    src_r = r1_of[okm]
    src_l = lane_of[okm]
    gws = np.repeat(np.asarray(ws_of_group, np.int64),
                    np.diff(np.asarray(starts)))
    vals_grid[src_r, src_l] = vals[co][okm]
    rel_grid[src_r, src_l] = (sorted_cols[okm] - gws[okm]).astype(np.int32)

    # ---- stage 2: (l, sub) rows -> lane b, slack S2 --------------------
    # element position after T1: row (l, r1 // 128), lane r1 % 128
    e_l = src_l
    e_sub = src_r // 128
    e_srclane = src_r % 128
    orig = co[okm]                                # original element index
    e_b = b[orig]
    e_ahi = ahi[orig]
    e_amod = amod[orig]

    r2 = 128 * nsub
    key2 = (e_l * nsub + e_sub) * 128 + e_b
    o2 = np.lexsort((np.arange(len(key2)), key2))
    rank2 = np.empty((len(key2),), np.int64)
    rank2[o2] = np.arange(len(key2)) - np.searchsorted(
        key2[o2], key2[o2])
    fit2 = rank2 < s2
    idx2 = np.full((r2, s2, 128), 128, np.int32)
    idx2[(e_l * nsub + e_sub)[fit2], rank2[fit2], e_b[fit2]] = \
        e_srclane[fit2]

    # ---- stage 3: (l, b) slabs -> (ahi, amod), slack S3 ----------------
    # element position after the T2 swap: slab l*128 + b,
    # column sub * S2 + rank2
    g3 = nahi * s3
    w3 = -(-(nsub * s2) // 128) * 128
    slab = e_l * 128 + e_b
    c3 = e_sub * s2 + rank2
    key3 = (slab * nahi + e_ahi) * 128 + e_amod
    valid3 = fit2
    key3m = np.where(valid3, key3, np.int64(-1))
    o3 = np.lexsort((np.arange(len(key3m)), key3m))
    rank3 = np.empty((len(key3m),), np.int64)
    rank3[o3] = np.arange(len(key3m)) - np.searchsorted(
        key3m[o3], key3m[o3])
    fit3 = valid3 & (rank3 < s3)
    # the padded-nq decomposition makes stage 3 collision-free (S3 note)
    assert nnz == 0 or not (valid3 & (rank3 > 0)).any()
    idx3 = np.full((16384, g3, 128), w3, np.int32)
    idx3[slab[fit3], (e_ahi * s3 + rank3)[fit3], e_amod[fit3]] = \
        c3[fit3].astype(np.int32)

    # ---- residue: depth-cap overflow + anything that missed a slot ----
    res_mask[np.nonzero(okm)[0][~fit3]] = True
    res_ids = co[res_mask]                        # original order ids
    rr = np.concatenate([rows[res_ids].astype(np.int32), deep_rows])
    rc = np.concatenate([cols[res_ids].astype(np.int32), deep_cols])
    rv = np.concatenate([vals[res_ids], deep_vals])
    rorder = np.argsort(rr, kind="stable")
    res_rows = rr[rorder]
    res_cols = rc[rorder]
    res_vals = rv[rorder]

    vtab_len = max(int(max(ws_of_group, default=0)) + W_STREAM,
                   W_STREAM)
    vtab_len = -(-vtab_len // 1024) * 1024

    return StreamPlan(
        vals_grid=jnp.asarray(vals_grid),
        rel_grid=jnp.asarray(rel_grid),
        ws=jnp.asarray(np.asarray(tile_ws, np.int32)),
        pp=jnp.asarray(tpp.astype(np.int32)),
        nxt=jnp.asarray(nxt.astype(np.int32)),
        idx2=jnp.asarray(idx2),
        idx3=jnp.asarray(idx3),
        res_rows=jnp.asarray(res_rows),
        res_cols=jnp.asarray(res_cols),
        res_vals=jnp.asarray(res_vals),
        w=W_STREAM, k=k, nq=nq, nsub=nsub, w3=w3, nahi=nahi,
        vtab_len=vtab_len, n_rows=n_rows,
    )


def stream_apply(p: StreamPlan, vpad: jax.Array) -> jax.Array:
    """u_stream (n_rows,) = the planned slots' contribution to A @ v.

    vpad: (>= num_cols,) f32 dense vector (zero-padded).
    """
    vtab = jnp.zeros((p.vtab_len,), jnp.float32)
    nfill = min(p.vtab_len, vpad.shape[0])
    vtab = vtab.at[:nfill].set(vpad[:nfill].astype(jnp.float32))

    s2 = p.idx2.shape[1]
    s3 = p.idx3.shape[1] // p.nahi
    a1 = window_product(
        p.vals_grid, p.rel_grid, p.ws, p.pp, p.nxt, vtab, w=p.w)
    t1 = a1.T.reshape(128 * p.nsub, 128)              # (l, sub) rows
    a2 = rowwise_gather(t1, p.idx2, s2)               # (R2, s2, 128)
    a2v = a2.reshape(128, p.nsub, s2, 128)
    x3 = jnp.transpose(a2v, (0, 3, 1, 2)).reshape(16384, p.nsub * s2)
    if x3.shape[1] < p.w3:
        x3 = jnp.concatenate(
            [x3, jnp.zeros((16384, p.w3 - x3.shape[1]), x3.dtype)],
            axis=1)
    a3 = rowwise_gather(x3, p.idx3, p.nahi * s3)      # (16384, G3, 128)
    f = a3.reshape(128, 128, p.nahi, s3, 128).sum(axis=3)
    grid = jnp.transpose(f, (2, 3, 1, 0)).reshape(-1, 128)
    grid = grid[: p.k * p.nq]
    u = grid.reshape(p.k, p.nq, 128).sum(axis=0).reshape(-1)

    if p.res_rows.shape[0]:
        contrib = p.res_vals.astype(jnp.float32) * jnp.take(
            vtab, p.res_cols)
        u = u + jax.ops.segment_sum(
            contrib, p.res_rows, num_segments=p.nq * 128,
            indices_are_sorted=True)
    return u[: p.n_rows]
