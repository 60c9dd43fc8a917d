"""Sparse matrix - sparse matrix multiply C = A @ B on BmSparse.

TPU-native restatement of the reference SpGEMM
(`bmSparse_mult`, ref: src/bmSparse_SPGEMM.cu:827-1223). The reference's
phases map as follows (phase labels T1..T6 follow SURVEY.md §2 #4):

  T1  B blocks per block-row (reduce_by_key/is_same_row, ref :840-847)
        -> segment_sum over B.brow
  T2  per-A-block task counts (gather, ref :857-864)
        -> take(B_row_count, A.bcol)
  T3  task-list expansion (scan/scatter/task_creator, ref :875-932)
        -> ONE jnp.repeat over stacked per-block fields (searchsorted and
           scatter+cumsum formulations measured 40 ms / ~5 ms at 330k
           tasks on v5e; repeat is 0.94 ms)
  T4  bitmap-product pruning (remove_if/multiplication_checker, ref :944-948)
        -> bit-parallel byte-AND structural product on the packed words
           (format/bitmap.py); zero-product tasks sort to the tail
  T5  sort tasks by C key (thrust::sort | bb_segsort, ref :963-1016)
        -> one lax.sort with lexicographic (row, col) int32 keys carrying
           the task product bitmaps; replaces both strategies and the
           BORDER=2,730,000 crossover (ref :53)
  T6  C structure: keys, bitmaps (bmp_calculator OR-reduction), offsets,
      nnz (ref :1031-1107)
        -> segment ids + row-granular segment_sum of bit planes + cumsum

  numeric multiplyV11..V15 (ref :205-733) -> task-SELL layout: C block on
      the 128-lane axis, sigma-sorted by task count, per-chunk-K padded;
      A/B tiles lane-gathered from transposed (64, nb+1) tables; the 8x8
      block product is 8 VPU fused multiply-accumulates (the analogue of
      the reference's default scalar variant tc_version=5, ref :1230);
      accumulation is a dense K-sum; bit-order packing is the row-granular
      sort-compaction in _compress_sigma. The chunked segment-sum path
      (_numeric_xla) remains for the jit-safe padded/shard_map entry.

Two entry points:
  * `spgemm(A, B)`       — host-orchestrated: syncs the data-dependent
    sizes (task count, C block count, C nnz) to host between jitted
    stages, exactly where the reference does its D->H memcpys
    (ref :1095,1106), with shape-bucketing to bound recompiles.
  * `spgemm_padded(A, B, max_tasks, max_c_blocks, max_c_nnz)` — fully
    jit-compatible with caller-supplied upper bounds (used by shard_map
    multi-chip path and compile checks).

Numerics: inputs any float dtype (reference uses fp16 -> TPU bf16),
accumulation/output fp32 (ref OUTPUT_TYPE, src/bmSparse_SPGEMM.cu:51).
C's structure is the *structural* product — numerically-cancelled entries
are stored as explicit zeros, exactly like the reference.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..config import bucket_size, get_config
from ..format import bitmap as bm
from ..format.bmsparse import BmSparse
from ..utils.timing import PhaseTimer

_NUMERIC_CHUNK = 1 << 16  # tasks per scan step in the numeric phase


def _check_operands(a: BmSparse, b: BmSparse) -> None:
    if a.num_cols != b.num_rows:
        raise ValueError(f"inner dims mismatch: {a.shape} @ {b.shape}")
    if a.transposed:
        raise ValueError("A must be stored untransposed (row-major blocks)")
    # B may be stored either way; transposed is the fast layout the
    # reference uses (ref: src/bmSparse_SPGEMM.cu:1262), but decompression
    # normalizes, so both work.


# ---------------------------------------------------------------------------
# T1 + T2: task counting
# ---------------------------------------------------------------------------
@partial(jax.jit, static_argnames=("num_b_block_rows",))
def _task_counts(a: BmSparse, b: BmSparse, num_b_block_rows: int):
    """Per-A-block task counts + exclusive offsets + total (traced).

    B's per-row start positions come from a positional segment_min rather
    than a cumsum of counts, so B may contain padding blocks *between*
    row groups (as produced by the multi-chip all-gather halo exchange) —
    the only requirement is that each block-row's valid blocks are
    contiguous and stored in intra-row sorted order.
    """
    b_valid = ((b.bmp_hi | b.bmp_lo) != 0).astype(jnp.int32)
    b_row_count = jax.ops.segment_sum(
        b_valid, b.brow, num_segments=num_b_block_rows
    )                                                   # T1
    pos = jnp.arange(b.nb_pad, dtype=jnp.int32)
    b_row_start = jax.ops.segment_min(
        jnp.where(b_valid > 0, pos, jnp.int32(2**31 - 1)),
        b.brow,
        num_segments=num_b_block_rows,
    )
    a_valid = (a.bmp_hi | a.bmp_lo) != 0
    bcol = jnp.clip(a.bcol, 0, num_b_block_rows - 1)
    cnt = jnp.where(a_valid, jnp.take(b_row_count, bcol), 0)  # T2
    offs = jnp.cumsum(cnt) - cnt
    total = offs[-1] + cnt[-1] if cnt.shape[0] else jnp.int32(0)
    return cnt.astype(jnp.int32), offs.astype(jnp.int32), b_row_start.astype(jnp.int32), total


# ---------------------------------------------------------------------------
# T3 + T4 + T5: task list construction, pruning, sort by C key
# ---------------------------------------------------------------------------
@partial(jax.jit, static_argnames=("num_tasks", "c_row_sentinel"))
def _build_tasks(
    a: BmSparse,
    b: BmSparse,
    task_offs: jax.Array,
    b_row_start: jax.Array,
    total: jax.Array,
    num_tasks: int,
    c_row_sentinel: int,
):
    """Materialize the (padded) task list sorted by C key, pruned tasks and
    padding at the tail.

    Returns (a_idx, b_idx, ck_row, ck_col, ph, pl, nz_total) where task t
    multiplies A block a_idx[t] by B block b_idx[t] into C block
    (ck_row, ck_col)[t] with structural product bitmap (ph, pl)[t].
    Tasks with an all-zero structural product (pruned by the reference's
    multiplication_checker) and padding tasks carry ck_row == sentinel and
    sort last; nz_total counts surviving tasks.
    """
    t = jnp.arange(num_tasks, dtype=jnp.int32)
    valid = t < total
    # T3: expand every per-A-block quantity to its task span in ONE
    # jnp.repeat over stacked fields — measured 0.94 ms at 330k tasks vs
    # ~5 ms for scatter+cumsum formulations and 40 ms for searchsorted.
    nbr_b = b_row_start.shape[0]
    start_per_blk = jnp.take(
        b_row_start, jnp.clip(a.bcol, 0, nbr_b - 1)
    )  # nb-sized gather (cheap)
    counts = jnp.concatenate(
        [task_offs[1:] - task_offs[:-1], (total - task_offs[-1])[None]]
    ).astype(jnp.int32)
    fields = jnp.stack(
        [
            jnp.arange(a.nb_pad, dtype=jnp.int32),  # -> a_idx
            task_offs,                              # -> off_t
            start_per_blk,                          # -> b row start
            a.bmp_hi.astype(jnp.int32),             # -> task A bitmap hi
            a.bmp_lo.astype(jnp.int32),             # -> task A bitmap lo
            a.brow,                                 # -> task C block-row
            jnp.zeros((a.nb_pad,), jnp.int32),
            jnp.zeros((a.nb_pad,), jnp.int32),
        ],
        axis=1,
    )                                           # (nb, 8)
    c = jnp.repeat(
        fields, counts, axis=0, total_repeat_length=num_tasks
    )                                           # (nt, 8)
    a_idx = jnp.clip(c[:, 0], 0, a.nb_pad - 1)
    within = t - c[:, 1]
    b_idx = jnp.clip(c[:, 2] + within, 0, b.nb_pad - 1)
    a_hi = c[:, 3].astype(jnp.uint32)
    a_lo = c[:, 4].astype(jnp.uint32)
    a_row = c[:, 5]

    # B-side fields in one packed row-gather (per-row cost, not per-field).
    b_tbl = jnp.stack(
        [
            b.bmp_hi.astype(jnp.int32),
            b.bmp_lo.astype(jnp.int32),
            b.bcol,
            jnp.zeros_like(b.bcol),
        ],
        axis=1,
    )                                                    # (nb, 4)
    b_rows = jnp.take(b_tbl, b_idx, axis=0)              # (nt, 4)
    b_hi = b_rows[:, 0].astype(jnp.uint32)
    b_lo = b_rows[:, 1].astype(jnp.uint32)
    b_col = b_rows[:, 2]

    # T4: structural block product (bmp_calculator); zero product => prune.
    ph, pl = bm.bitmap_product(a_hi, a_lo, b_hi, b_lo,
                               b_transposed=b.transposed)
    alive = valid & ((ph | pl) != 0)
    ph = jnp.where(alive, ph, 0)
    pl = jnp.where(alive, pl, 0)

    # C key (task_elem_to_C_key, ref :111-119): (A block-row, B block-col).
    ck_row = jnp.where(alive, a_row, jnp.int32(c_row_sentinel))
    ck_col = jnp.where(alive, b_col, jnp.int32(0))
    # Cluster dead/padding tasks at the top block index so the sorted tail
    # keeps tight index spans (their products are zero anyway).
    a_idx = jnp.where(alive, a_idx, jnp.int32(a.nb_pad - 1))
    b_idx = jnp.where(alive, b_idx, jnp.int32(b.nb_pad - 1))

    # T5: single lexicographic sort replaces thrust::sort/bb_segsort; the
    # task product bitmaps ride along so T6 never regathers blocks.
    ck_row, ck_col, a_idx, b_idx, ph, pl = jax.lax.sort(
        (ck_row, ck_col, a_idx, b_idx,
         ph.astype(jnp.int32), pl.astype(jnp.int32)),
        num_keys=2,
    )
    nz_total = jnp.sum(alive.astype(jnp.int32))
    return (a_idx, b_idx, ck_row, ck_col,
            ph.astype(jnp.uint32), pl.astype(jnp.uint32), nz_total)


# ---------------------------------------------------------------------------
# T6: C symbolic structure from the sorted task list
# ---------------------------------------------------------------------------
@partial(jax.jit, static_argnames=("c_row_sentinel",))
def _c_symbolic_scan(
    ph: jax.Array, pl: jax.Array,
    ck_row: jax.Array, ck_col: jax.Array,
    c_row_sentinel: int,
):
    """Task-space C structure via a segmented OR-scan — the host-path
    replacement for _c_symbolic's expand+segment-sum (measured ~5.3 ms vs
    ~1 ms at 330k tasks on v5e: per-task scatters cost ~10 ns/index; the
    Hillis-Steele scan is ~20 rolls over packed words).

    Everything stays in TASK space: the OR of each C block's product
    bitmaps and its exclusive value offset sit at the block's LAST task
    position; the host (which pulls c_seg for the numeric planner anyway)
    builds the end-position index that compacts them.

    Returns (c_seg, hi_scan, lo_scan, off_task, keys_tbl, nbc, nnzc) where
    keys_tbl is the (nt, 8) int32 row table [ck_row, ck_col, hi, lo, off,
    cnt, 0, 0] for row-granular gathers at end positions.
    """
    nt = ph.shape[0]
    alive = ck_row != c_row_sentinel
    same = (ck_row[1:] == ck_row[:-1]) & (ck_col[1:] == ck_col[:-1])
    new = jnp.concatenate(
        [jnp.ones((1,), jnp.int32), 1 - same.astype(jnp.int32)]
    )
    c_seg = jnp.cumsum(new) - 1
    nbc = jnp.max(jnp.where(alive, c_seg + 1, 0)) if nt else jnp.int32(0)

    # segmented inclusive OR-scan (Hillis-Steele over rolls; rolls are the
    # fast shift primitive on TPU)
    hi, lo = ph, pl
    t_iota = jnp.arange(nt, dtype=jnp.int32)
    sh = 1
    while sh < nt:
        mask = (t_iota >= sh) & (jnp.roll(c_seg, sh) == c_seg)
        hi = hi | jnp.where(mask, jnp.roll(hi, sh), 0)
        lo = lo | jnp.where(mask, jnp.roll(lo, sh), 0)
        sh *= 2
    is_end = jnp.concatenate(
        [c_seg[1:] != c_seg[:-1], jnp.ones((1,), bool)]
    ) & alive
    cnt = jnp.where(is_end, bm.popcount(hi, lo), 0)
    csum = jnp.cumsum(cnt)
    off_task = (csum - cnt).astype(jnp.int32)
    nnzc = csum[-1] if nt else jnp.int32(0)
    keys_tbl = jnp.stack(
        [
            ck_row, ck_col,
            hi.astype(jnp.int32), lo.astype(jnp.int32),
            off_task, cnt.astype(jnp.int32),
            jnp.zeros((nt,), jnp.int32), jnp.zeros((nt,), jnp.int32),
        ],
        axis=1,
    )
    return c_seg, keys_tbl, nbc, nnzc


@partial(jax.jit, static_argnames=("c_row_sentinel",))
def _c_symbolic(
    ph: jax.Array, pl: jax.Array,
    ck_row: jax.Array, ck_col: jax.Array,
    c_row_sentinel: int,
):
    """C block keys, bitmaps, offsets from sorted tasks (with their
    structural product bitmaps ph/pl from _build_tasks).

    Returns (c_seg, cbrow, cbcol, c_hi, c_lo, c_offsets, nbc, nnzc); arrays
    sized num_tasks (an upper bound on C's block count), padding past nbc.
    """
    nt = ck_row.shape[0]
    alive = ck_row != c_row_sentinel
    same = (ck_row[1:] == ck_row[:-1]) & (ck_col[1:] == ck_col[:-1])
    new = jnp.concatenate(
        [jnp.ones((1,), jnp.int32), 1 - same.astype(jnp.int32)]
    )
    # Dead/padding tasks share the sentinel key and collapse into one
    # trailing segment; exclude them from the block count.
    c_seg = jnp.cumsum(new) - 1
    nbc = jnp.max(jnp.where(alive, c_seg + 1, 0)) if nt else jnp.int32(0)

    # one 2-wide row scatter instead of two scalar scatters (TPU scatter
    # cost is per index, not per byte)
    keypair = jnp.stack([ck_row, ck_col], axis=1)            # (nt, 2)
    ckeys = (
        jnp.tile(jnp.array([[c_row_sentinel, 0]], jnp.int32), (nt, 1))
        .at[c_seg].set(keypair)
    )
    cbrow = ckeys[:, 0]
    cbcol = ckeys[:, 1]

    # C bitmap = OR over the segment's task products (bmp_calculator +
    # bmp_sum reduce_by_key, ref :1067-1083). Dead tasks carry zero
    # bitmaps, so a plain segmented OR is exact. OR on packed u32 words:
    # segment_max of each word... bitwise OR isn't max; use the bit-plane
    # trick: OR == (segment_sum of expanded bits) > 0, row-granular.
    bits = bm.expand_bits(ph, pl)                       # (nt, 64)
    c_bits = (
        jax.ops.segment_sum(bits, c_seg, num_segments=nt) > 0
    ).astype(jnp.int32)
    c_hi, c_lo = bm.pack_bits(c_bits)

    # offsets / nnz (popcount + exclusive_scan, ref :1086-1107).
    cnt = jnp.sum(c_bits, axis=1, dtype=jnp.int32)
    c_offsets = (jnp.cumsum(cnt) - cnt).astype(jnp.int32)
    nnzc = c_offsets[-1] + cnt[-1] if nt else jnp.int32(0)
    c_offsets = jnp.where(
        jnp.arange(nt) < nbc, c_offsets, jnp.maximum(nnzc - 1, 0)
    ).astype(jnp.int32)
    return c_seg, cbrow, cbcol, c_hi, c_lo, c_offsets, nbc, nnzc


# ---------------------------------------------------------------------------
# Numeric phase — task-SELL layout (the fast path)
# ---------------------------------------------------------------------------
# The reference's numeric kernels walk each C block's task span with a warp
# (ref: src/bmSparse_SPGEMM.cu:205-733). The TPU-native equivalent puts the
# C block on the 128-lane axis: C blocks are sigma-sorted by task count,
# grouped into chunks of 128, and each chunk padded to its (bucketed) max
# task count K. The per-C-block accumulation is then a dense sum over the K
# axis — no segment_sum (measured ~0.08 Gblk/s on v5e, the dominant cost of
# the naive formulation). A/B tiles are fetched with lane-gathers from
# transposed (64, nb+1) tables (~0.5 Gidx/s, the fastest dynamic access
# XLA offers on TPU).

_SELL_SLAB = 64          # chunks per scan slab (bounds gather transients)
_K_BUCKETS = tuple(
    sorted({1, 2, 3} | {m for b in range(2, 21) for m in ((1 << b), 3 << (b - 1))})
)


def _bucket_k(k: int) -> int:
    for b in _K_BUCKETS:
        if b >= k:
            return b
    return k


def _plan_task_sell(c_seg_h, a_idx_h, b_idx_h, nbc: int, sent_a: int, sent_b: int):
    """Host-side numeric plan: distribute sorted tasks into per-C-block
    SELL slots. Returns (groups, order) where groups is a list of
    (ta, tb) int32 arrays of shape (chunks_g, K_g, 128) and order is the
    sigma permutation (position p in SELL space holds C block order[p])."""
    import numpy as np

    counts = np.bincount(c_seg_h, minlength=nbc).astype(np.int64)
    order = np.argsort(-counts, kind="stable")
    pos = np.empty(nbc, np.int64)
    pos[order] = np.arange(nbc)
    nchunks = -(-nbc // 128)
    counts_sorted = counts[order]
    k_chunk = np.empty(nchunks, np.int64)
    for c in range(nchunks):
        k_chunk[c] = _bucket_k(
            max(int(counts_sorted[c * 128 : (c + 1) * 128].max()), 1)
        )
    starts = np.cumsum(counts) - counts
    t = np.arange(len(c_seg_h))
    rank = t - starts[c_seg_h]
    p = pos[c_seg_h]
    chunk = p // 128
    lane = p % 128

    boundaries = np.nonzero(np.diff(k_chunk))[0] + 1
    group_starts = np.concatenate([[0], boundaries, [nchunks]])
    groups = []
    for gi in range(len(group_starts) - 1):
        c0, c1 = int(group_starts[gi]), int(group_starts[gi + 1])
        kg = int(k_chunk[c0])
        sel = (chunk >= c0) & (chunk < c1)
        ta = np.full((c1 - c0, kg, 128), sent_a, np.int32)
        tb = np.full((c1 - c0, kg, 128), sent_b, np.int32)
        ta[chunk[sel] - c0, rank[sel], lane[sel]] = a_idx_h[sel]
        tb[chunk[sel] - c0, rank[sel], lane[sel]] = b_idx_h[sel]
        groups.append((ta, tb))
    return groups, order


@partial(jax.jit, static_argnames=("k",))
def _numeric_sell_slab(a_t, b_t, ta, tb, k: int):
    """Products for (s, k, 128) task slots -> (s*128, 64) row-major tiles.

    a_t/b_t: (64, nb+1) transposed dense tiles with a zero sentinel column;
    slot layouts [i*8+j] for A, [j*8+m] for B (both row-major).
    """
    s = ta.shape[0]
    ga = jnp.moveaxis(jnp.take(a_t, ta, axis=1), 0, 3)   # (s, k, 128, 64)
    gb = jnp.moveaxis(jnp.take(b_t, tb, axis=1), 0, 3)
    ga = jnp.moveaxis(ga, 2, 3).reshape(s, k, 8, 8, 128)  # [., ., i, j, lane]
    gb = jnp.moveaxis(gb, 2, 3).reshape(s, k, 8, 8, 128)  # [., ., j, m, lane]
    acc = jnp.zeros((s, k, 8, 8, 128), jnp.float32)
    for j in range(8):
        acc = acc + ga[:, :, :, j, None, :] * gb[:, :, None, j, :, :]
    csum = jnp.sum(acc, axis=1)                          # (s, 8, 8, 128)
    return jnp.transpose(csum, (0, 3, 1, 2)).reshape(s * 128, 64)


def _numeric_sell_group(a_t, b_t, ta, tb) -> jax.Array:
    """One K-group, scanned in slabs to bound gather transients."""
    ch, k, _ = ta.shape
    if ch <= _SELL_SLAB or ch * k * 128 <= _SELL_SLAB * 128 * 8:
        return _numeric_sell_slab(a_t, b_t, ta, tb, k)
    slab = max(1, min(_SELL_SLAB, (1 << 16) // max(k, 1)))
    nsl = -(-ch // slab)
    pad = nsl * slab - ch
    if pad:
        sa = jnp.full((pad, k, 128), a_t.shape[1] - 1, jnp.int32)
        sb = jnp.full((pad, k, 128), b_t.shape[1] - 1, jnp.int32)
        ta = jnp.concatenate([ta, sa])
        tb = jnp.concatenate([tb, sb])
    ta = ta.reshape(nsl, slab, k, 128)
    tb = tb.reshape(nsl, slab, k, 128)

    def step(_, ab):
        return 0, _numeric_sell_slab(a_t, b_t, ab[0], ab[1], k)

    _, out = jax.lax.scan(step, 0, (ta, tb))
    return out.reshape(nsl * slab * 128, 64)[: ch * 128]


@partial(jax.jit, static_argnames=("num_c_nnz",))
def _compress_rows(
    c_rows: jax.Array,
    hi: jax.Array, lo: jax.Array, off: jax.Array,
    num_c_nnz: int,
) -> jax.Array:
    """Pack dense C tiles into bit-order values; hi/lo/off are row-aligned
    with c_rows (any order). See _compress_sigma for the method notes."""
    return _compress_core(c_rows, hi, lo, off, num_c_nnz)


@partial(jax.jit, static_argnames=("num_c_nnz",))
def _compress_sigma(
    c_rows: jax.Array, order: jax.Array,
    c_hi: jax.Array, c_lo: jax.Array, c_offsets: jax.Array,
    num_c_nnz: int,
) -> jax.Array:
    """Pack sigma-ordered dense C tiles into bit-order values.

    c_rows[p] is the dense tile of C block order[p]; rows past the valid
    range carry zero bitmaps (fill) and contribute nothing.

    A naive per-element scatter runs at ~0.14 Gidx/s on v5e (measured:
    73 ms for 8M values — dominating the whole SpGEMM); TPU scatters cost
    per *index*, not per byte. So everything here is row-granular: each
    block's packed values occupy positions [off, off+cnt) which touch at
    most TWO 64-wide output rows (cnt <= 64). Per block: (1) a 64-lane
    sort compacts the set-bit values to the front in rank order, split
    into the part landing in row off//64 and the part in the next row;
    (2) a 6-stage conditional roll rotates part 0 to its lane offset
    off%64 (part 1 always starts at lane 0); (3) two row scatter-adds
    place them. Blocks sharing a row touch disjoint lanes, so adds never
    collide on real values.
    """
    hi = jnp.take(c_hi, order, axis=0, mode="fill", fill_value=0)
    lo = jnp.take(c_lo, order, axis=0, mode="fill", fill_value=0)
    off = jnp.take(c_offsets, order, axis=0, mode="fill", fill_value=0)
    return _compress_core(c_rows, hi, lo, off, num_c_nnz)


def _compress_core(c_rows, hi, lo, off, num_c_nnz: int) -> jax.Array:
    bits = bm.expand_bits(hi, lo)                       # (R, 64)
    rank = bm.prefix_popcount(bits)
    r = (off % 64)[:, None].astype(jnp.int32)
    set_ = bits > 0
    lane = jnp.arange(64, dtype=jnp.int32)[None, :]

    # one stable 64-lane sort packs the set-bit values to the front in
    # rank order; one variable right-rotation by r then holds BOTH parts:
    # lanes [r, 64) carry the first-row values, wrapped lanes [0, cnt+r-64)
    # carry the next-row values.
    key = jnp.where(set_, rank, 64 + lane)
    _, packed = jax.lax.sort((key, c_rows), dimension=1, num_keys=1)
    cnt = jnp.sum(set_, axis=1, dtype=jnp.int32)[:, None]
    packed = jnp.where(lane < cnt, packed, 0.0)
    for k in range(6):                # conditional rolls: rotate right by r
        rolled = jnp.roll(packed, 1 << k, axis=1)
        packed = jnp.where((r >> k) & 1 > 0, rolled, packed)
    v0 = jnp.where((lane >= r) & (lane < r + cnt), packed, 0.0)
    v1 = jnp.where(lane < cnt + r - 64, packed, 0.0)

    t_rows = -(-num_c_nnz // 64) if num_c_nnz else 1
    b_row = (off // 64).astype(jnp.int32)
    out = (
        jnp.zeros((t_rows + 1, 64), jnp.float32)
        .at[b_row].add(v0, mode="drop")
        .at[b_row + 1].add(v1, mode="drop")
    )
    return out[:t_rows].reshape(-1)[:num_c_nnz]


# ---------------------------------------------------------------------------
# Numeric phase — chunked segment-sum path (jit-safe; shard_map uses this)
# ---------------------------------------------------------------------------
def _numeric_xla(
    a_flat: jax.Array, b_flat: jax.Array,
    a_idx: jax.Array, b_idx: jax.Array, c_seg: jax.Array,
    num_c_blocks: int,
    a_span: int = 0, b_span: int = 0,
):
    """Chunked batched 8x8 block products accumulated per C block.

    The TPU analogue of multiplyV15's scalar FMA loop (ref :205-291):
    gather flat dense tiles, eight 64-lane VPU multiply-accumulates per
    task (see format/blockops.py), segment-sum by C block. lax.scan over
    fixed-size task chunks bounds peak memory the way the reference's
    TASK_BUFFER staging does (ref :343,358). All intermediates are (n, 64)
    — never (n, 8, 8) — to keep TPU memory tiling dense.
    """
    from ..format.blockops import block_matmul_flat
    from .gather import gather_rows

    nt = a_idx.shape[0]
    chunk = min(_NUMERIC_CHUNK, nt)
    nchunks = -(-nt // chunk)
    pad = nchunks * chunk - nt
    if pad:
        a_idx = jnp.concatenate([a_idx, jnp.zeros((pad,), jnp.int32)])
        b_idx = jnp.concatenate([b_idx, jnp.zeros((pad,), jnp.int32)])
        # padding tasks dump into segment num_c_blocks (dropped)
        c_seg = jnp.concatenate(
            [c_seg, jnp.full((pad,), num_c_blocks, jnp.int32)]
        )
    a_idx = a_idx.reshape(nchunks, chunk)
    b_idx = b_idx.reshape(nchunks, chunk)
    c_seg = c_seg.reshape(nchunks, chunk)

    def step(acc, operands):
        ai, bi, cs = operands
        # Tasks are sorted by C key, so chunk index spans are bounded for
        # clustered matrices -> MXU one-hot gather instead of row gathers.
        blk_a = gather_rows(a_flat, ai, a_span)             # (chunk, 64)
        blk_b = gather_rows(b_flat, bi, b_span)             # (chunk, 64)
        contrib = block_matmul_flat(blk_a, blk_b, b_transposed=False)
        acc = acc + jax.ops.segment_sum(
            contrib, cs, num_segments=num_c_blocks
        )
        return acc, None

    init = jnp.zeros((num_c_blocks, 64), jnp.float32)
    if nchunks == 1:
        acc, _ = step(init, (a_idx[0], b_idx[0], c_seg[0]))
        return acc
    acc, _ = jax.lax.scan(step, init, (a_idx, b_idx, c_seg))
    return acc


@partial(
    jax.jit,
    static_argnames=("num_c_blocks", "num_c_nnz", "impl", "a_span", "b_span"),
)
def _numeric_and_compress(
    a_flat: jax.Array, b_flat: jax.Array,
    a_idx: jax.Array, b_idx: jax.Array, c_seg: jax.Array,
    c_hi: jax.Array, c_lo: jax.Array, c_offsets: jax.Array,
    num_c_blocks: int, num_c_nnz: int, impl: str,
    a_span: int = 0, b_span: int = 0,
):
    if impl == "pallas":
        from .pallas.spgemm_kernel import numeric_pallas

        c_dense = numeric_pallas(
            a_flat, b_flat, a_idx, b_idx, c_seg, num_c_blocks
        )
    else:
        c_dense = _numeric_xla(
            a_flat, b_flat, a_idx, b_idx, c_seg, num_c_blocks,
            a_span, b_span,
        )

    # Compress through C's structural bitmap (row-major / untransposed):
    # value slot of address a is offsets + prefix-popcount (the inverse of
    # decompress_blocks).
    bits = bm.expand_bits(c_hi[:num_c_blocks], c_lo[:num_c_blocks])
    slot = bm.prefix_popcount(bits)
    pos = jnp.where(
        bits > 0,
        c_offsets[:num_c_blocks, None] + slot,
        num_c_nnz,  # out of range -> dropped
    )
    c_values = jnp.zeros((num_c_nnz,), jnp.float32).at[pos.reshape(-1)].set(
        c_dense.reshape(-1), mode="drop"
    )
    return c_values


# ---------------------------------------------------------------------------
# Public entry points
# ---------------------------------------------------------------------------
def spgemm(
    a,
    b,
    impl: str | None = None,
    verbose: bool | None = None,
) -> BmSparse:
    """C = A @ B, host-orchestrated (dynamic exact-ish shapes).

    Mirrors the reference driver defaults: A untransposed, B in transposed
    intra-block layout (ref: src/bmSparse_SPGEMM.cu:1261-1262), fp32 output.
    Operands may be BmSparse or Prepared (ops.plan.prepare) — pass Prepared
    when reusing a matrix across calls to amortize decompression.
    """
    from .plan import Prepared, as_matrix

    a_prep = a if isinstance(a, Prepared) else None
    b_prep = b if isinstance(b, Prepared) else None
    a, b = as_matrix(a), as_matrix(b)
    _check_operands(a, b)
    cfg = get_config()
    impl = impl or (cfg.spgemm_impl if cfg.spgemm_impl != "auto" else "xla")
    verbose = cfg.verbose if verbose is None else verbose
    timer = PhaseTimer(enabled=verbose)

    nbr_b = b.block_rows
    with timer.phase("T_1"):
        cnt, offs, b_row_start, total = _task_counts(a, b, nbr_b)
        num_tasks = int(total)  # host sync (ref analogue :1095)
    sentinel = a.block_rows + 1

    t_pad = bucket_size(max(num_tasks, 1))
    with timer.phase("T_3"):
        a_idx, b_idx, ck_row, ck_col, t_ph, t_pl, nz_total = _build_tasks(
            a, b, offs, b_row_start, total, t_pad, sentinel
        )
        num_alive = int(nz_total)  # host sync
    if verbose:
        print(f"Task list size: {num_tasks}")
        print(f"Bmp reduction: {num_tasks - num_alive}")

    t2 = max(bucket_size(max(num_alive, 1)), 1)
    if t2 < t_pad:  # drop pruned tail (they sorted last)
        a_idx, b_idx, ck_row, ck_col, t_ph, t_pl = (
            x[:t2] for x in (a_idx, b_idx, ck_row, ck_col, t_ph, t_pl)
        )

    with timer.phase("T_6"):
        c_seg, keys_tbl, nbc, nnzc = _c_symbolic_scan(
            t_ph, t_pl, ck_row, ck_col, sentinel
        )
        num_c_blocks = int(nbc)   # host sync (ref :1095)
        num_c_nnz = int(nnzc)     # host sync (ref :1106)

    nbc_pad = min(bucket_size(max(num_c_blocks, 1)), c_seg.shape[0])
    nbc_pad = max(nbc_pad, num_c_blocks, 1)
    nnz_pad = max(bucket_size(max(num_c_nnz, 1)), 1)

    # Decompress once (amortized if operands came in Prepared).
    a_flat = (a_prep.dense_flat if a_prep is not None
              else a.decompress_blocks_flat())
    b_flat = (b_prep.dense_flat if b_prep is not None
              else b.decompress_blocks_flat())

    if impl not in ("xla", "sell", "auto"):
        raise ValueError(f"unknown SpGEMM impl {impl!r}")

    import numpy as np

    with timer.phase("T_9"):
        # host numeric plan: the pulled c_seg also yields each C block's
        # LAST task position, where the task-space symbolic results live
        c_seg_h = np.asarray(c_seg[:num_alive])
        a_idx_h = np.asarray(a_idx[:num_alive])
        b_idx_h = np.asarray(b_idx[:num_alive])
        counts_h = np.bincount(
            c_seg_h, minlength=max(num_c_blocks, 1)
        )[: max(num_c_blocks, 1)]
        end_pos = (np.cumsum(counts_h) - 1).astype(np.int64)

        if num_c_blocks > 0:
            groups, order = _plan_task_sell(
                c_seg_h, a_idx_h, b_idx_h, num_c_blocks,
                a_flat.shape[0], b_flat.shape[0],
            )
            a_t = jnp.concatenate(
                [a_flat.astype(jnp.float32).T,
                 jnp.zeros((64, 1), jnp.float32)], axis=1)
            b_t = jnp.concatenate(
                [b_flat.astype(jnp.float32).T,
                 jnp.zeros((64, 1), jnp.float32)], axis=1)
            parts = [
                _numeric_sell_group(a_t, b_t, jnp.asarray(ta), jnp.asarray(tb))
                for ta, tb in groups
            ]
            c_rows = parts[0] if len(parts) == 1 else jnp.concatenate(parts)
            # sigma-ordered end positions; out-of-range -> zero-bitmap fill
            idx_sig = np.full((c_rows.shape[0],), 2**30, np.int64)
            idx_sig[: len(order)] = end_pos[order]
            sig_tbl = jnp.take(
                keys_tbl, jnp.asarray(idx_sig.astype(np.int32)), axis=0,
                mode="fill", fill_value=0,
            )                                           # (R, 8)
            c_values = _compress_rows(
                c_rows,
                sig_tbl[:, 2].astype(jnp.uint32),
                sig_tbl[:, 3].astype(jnp.uint32),
                sig_tbl[:, 4], nnz_pad,
            )
        else:
            c_values = jnp.zeros((nnz_pad,), jnp.float32)

    # result container fields: one row-gather of the task-space table at
    # the natural-order end positions
    end_nat = np.full((nbc_pad,), 2**30, np.int64)
    end_nat[:num_c_blocks] = end_pos[:num_c_blocks]
    nat_tbl = jnp.take(
        keys_tbl, jnp.asarray(end_nat.astype(np.int32)), axis=0,
        mode="fill", fill_value=0,
    )                                                   # (nbc_pad, 8)
    b_iota = jnp.arange(nbc_pad, dtype=jnp.int32)
    valid_b = b_iota < num_c_blocks
    cbrow = jnp.where(valid_b, nat_tbl[:, 0], jnp.int32(a.block_rows))
    cbcol = jnp.where(valid_b, nat_tbl[:, 1], 0)
    c_off = jnp.where(
        valid_b, nat_tbl[:, 4], jnp.int32(max(num_c_nnz - 1, 0))
    )
    timer.report()

    return BmSparse(
        brow=cbrow, bcol=cbcol,
        bmp_hi=jnp.where(valid_b, nat_tbl[:, 2], 0).astype(jnp.uint32),
        bmp_lo=jnp.where(valid_b, nat_tbl[:, 3], 0).astype(jnp.uint32),
        offsets=c_off, values=c_values,
        nb=jnp.int32(num_c_blocks),
        num_rows=a.num_rows, num_cols=b.num_cols, nnz=num_c_nnz,
        transposed=False,
    )


@partial(
    jax.jit,
    static_argnames=("max_tasks", "max_c_blocks", "max_c_nnz", "impl"),
)
def spgemm_padded(
    a: BmSparse,
    b: BmSparse,
    max_tasks: int,
    max_c_blocks: int | None = None,
    max_c_nnz: int | None = None,
    impl: str = "xla",
) -> BmSparse:
    """Fully jit-compatible C = A @ B with static upper bounds.

    The result is padded: `C.nb` is the true block count; blocks past it
    have zero bitmaps. Used by the shard_map multi-chip path, where shapes
    must be static per shard.
    """
    max_c_blocks = max_c_blocks or max_tasks
    max_c_nnz = max_c_nnz or max_c_blocks * 64
    nbr_b = b.block_rows
    sentinel = a.block_rows + 1

    cnt, offs, b_row_start, total = _task_counts(a, b, nbr_b)
    a_idx, b_idx, ck_row, ck_col, t_ph, t_pl, _ = _build_tasks(
        a, b, offs, b_row_start, total, max_tasks, sentinel
    )
    c_seg, cbrow, cbcol, c_hi, c_lo, c_off, nbc, nnzc = _c_symbolic(
        t_ph, t_pl, ck_row, ck_col, sentinel
    )
    k = min(max_c_blocks, max_tasks)
    c_values = _numeric_and_compress(
        a.decompress_blocks_flat(), b.decompress_blocks_flat(),
        a_idx, b_idx, c_seg,
        c_hi[:k], c_lo[:k], c_off[:k],
        k, max_c_nnz, impl,
    )
    return BmSparse(
        brow=cbrow[:k], bcol=cbcol[:k],
        bmp_hi=c_hi[:k], bmp_lo=c_lo[:k],
        offsets=c_off[:k], values=c_values,
        nb=nbc,
        num_rows=a.num_rows, num_cols=b.num_cols, nnz=max_c_nnz,
        transposed=False,
    )
