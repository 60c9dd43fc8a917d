"""Pallas row-wise static-shuffle kernels — the routing primitives of
the stream tier (ops/route.py).

TPU has no vector scatter/gather against memory: XLA lowers dynamic
takes to per-index transfers (~0.14-0.3 G idx/s measured on v5e,
scratch/exp_gather.json E1-E3b) — the wall that makes classic CSR SpMV
pathological for scattered structures. What the hardware DOES have is
in-register lane shuffles: `tpu.dynamic_gather` within a (8, 128) vreg
runs ~27 G idx/s (measured, E7). These kernels express arbitrary STATIC
data movement as sequences of such shuffles:

  rowwise_gather: out[r, g, l] = x[r, idx[r, g, l]]  (idx static-ish,
  any source width W via a quarter select chain; idx == W -> 0.0)

Combined with XLA transposes (which move lanes across rows at stream
speed), two shuffle stages route any static permutation of millions of
elements at HBM-bound cost — the plan-time construction lives in
ops/route.py.

The reference has no analogue: on a GPU the same movement is a single
coalesced gather (ref: src/bmSparse_SPMV.cu:176). This is the TPU-native
substitute.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# rows of x processed per grid step (rowwise_gather's minimum tile)
_TILE = 8
# window_product rows per grid step: 8-row steps measured step-bound on
# web256k (3072 steps x ~0.16 us against ~0.5 us of vector compute);
# 32-row steps amortize the grid overhead 4x. Must match route.TILE_R
# (panel quotas are rounded to it so a step never straddles a panel).
_WTILE = 32


def _rowwise_kernel(idx_ref, x_ref, o_ref, *, nq: int, g_out: int,
                    tile: int):
    x = x_ref[...]                                   # (tile, W)
    for g in range(g_out):
        ix = idx_ref[:, g, :]                        # (tile, 128)
        l = ix % 128
        q = ix // 128
        acc = jnp.zeros((tile, 128), jnp.float32)
        for qq in range(nq):
            part = jnp.take_along_axis(
                x[:, qq * 128:(qq + 1) * 128], l, axis=1)
            acc = jnp.where(q == qq, part, acc)
        # sentinel idx == W has q == nq -> never selected -> stays 0
        o_ref[:, g, :] = acc


@functools.partial(jax.jit, static_argnames=("g_out",))
def rowwise_gather(x: jax.Array, idx: jax.Array, g_out: int) -> jax.Array:
    """out[r, g, l] = x[r, idx[r, g, l]] (0.0 where idx == x.shape[1]).

    x: (R, W) f32, W a multiple of 128; idx: (R, g_out, 128) int32 in
    [0, W]. R must be a multiple of 8. Pure in-register lane shuffles:
    W/128 shuffle+select pairs per output vreg.

    The grid tiles R as coarsely as VMEM allows: 8-row steps measured
    ~0.4 us of per-step overhead on v5e (930 us for a 2304-step stage
    whose HBM traffic prices at ~190 us), so small-W stages were
    step-bound.
    """
    r, w = x.shape
    assert w % 128 == 0 and r % _TILE == 0, (r, w)
    nq = w // 128
    # largest 8-multiple row tile whose (x + idx + out) blocks fit a
    # ~16 MB double-buffered budget. Tiles were capped at 64 rows
    # through round 5b; the resulting ~128-256 KB DMAs measured only
    # ~180 GB/s effective on v5e (stage-2 profile,
    # scratch/stream_profile.py) — 256-row tiles quadruple the DMA
    # grain and cut the grid-step overhead 4x.
    per_row = (w + g_out * 128 * 2) * 4
    cap = max(8, min(256, (16 << 20) // (2 * per_row) // 8 * 8))
    tile = next(
        t for t in (256, 128, 64, 32, 16, 8) if t <= cap and r % t == 0)
    kernel = functools.partial(
        _rowwise_kernel, nq=nq, g_out=g_out, tile=tile)
    return pl.pallas_call(
        kernel,
        grid=(r // tile,),
        in_specs=[
            pl.BlockSpec((tile, g_out, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, g_out, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r, g_out, 128), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(idx, x)


def _window_product_kernel(
    ws_ref,                     # scalar prefetch: (tiles,) int32 starts
    pp_ref,                     # scalar prefetch: (tiles,) int32 panel id
    nxt_ref,                    # scalar prefetch: (tiles,) int32 first
                                #   tile of the NEXT panel (t if none)
    vtab_ref,                   # ANY/HBM: (8, n_pad // 8) f32, tiled
    vals_ref,                   # VMEM: (TILE, 128) f32 coefficient tile
    rel_ref,                    # VMEM: (TILE, 128) int32 window-relative
    o_ref,                      # VMEM: (TILE, 128) f32 products
    win_ref,                    # scratch (2, 8, w // 8) f32
    sem_ref,
    *,
    w: int,
):
    # Window layout (round 5): the original (2, 1, w) scratch gave its
    # reads a 1-sublane layout Mosaic refuses to broadcast ("Invalid
    # input layout", the round-4 stream tier's real-TPU failure — the
    # kernel only ever ran in CPU interpret mode). The window now lives
    # SUBLANE-TILED: vtab[s, c] = v[c * 8 + s], so the scratch is a
    # proper (8, w/8) block and every op below is a proven pattern
    # (sell_kernel's window DMA + per-row dynamic_gather). Window starts
    # must be w-aligned so the DMA's lane offset ws/8 is provably
    # 128-divisible (w is a multiple of 1024).
    #
    # DMA cadence: ONE window fetch per PANEL, not per tile — all of a
    # panel's tiles read the same resident window (slot = panel parity,
    # double-buffered: the next panel's fetch is issued at the current
    # panel's first tile, so it overlaps the whole panel's compute).
    # Per-tile fetches measured DMA-latency-bound on web256k: 2304
    # tiles x ~2 us serialized against ~0.5 us of compute.
    t = pl.program_id(0)
    w8 = w // 8

    def dma(slot, tile):
        return pltpu.make_async_copy(
            vtab_ref.at[:, pl.ds(
                pl.multiple_of(ws_ref[tile] // 8, 128), w8)],
            win_ref.at[slot],
            sem_ref.at[slot],
        )

    pid = pp_ref[t]
    first = jnp.logical_or(t == 0, pp_ref[jnp.maximum(t - 1, 0)] != pid)

    @pl.when(t == 0)
    def _():
        dma(pid % 2, t).start()

    @pl.when(first & (nxt_ref[t] > t))
    def _():
        dma((pid + 1) % 2, nxt_ref[t]).start()

    @pl.when(first)
    def _():
        dma(pid % 2, t).wait()

    win = win_ref[pid % 2]                            # (8, w8)
    rel = rel_ref[...]                                # (TILE, 128)
    sub = rel % 8                                     # window sublane
    lc = rel // 8                                     # window lane col
    # Iterate over the 8 WINDOW SUBLANES broadcasting DATA (round 5b),
    # not over the 8 tile rows broadcasting indices: the whole tile's
    # lane indices feed ONE take_along_axis per (sublane, quarter), and
    # the per-row sublane dynamic_gather (which Mosaic lowers to a
    # compare/select ladder) disappears — ~3x fewer vector ops per tile
    # on w=1024 windows. The broadcast source is a STATIC row slice of
    # a properly (8, w8)-tiled scratch (a plain sublane broadcast), not
    # the (1, w) dynamic read that broke round 4's kernel on Mosaic.
    lcq = lc % 128
    vseg = jnp.zeros((_WTILE, 128), jnp.float32)
    for s in range(8):
        cand = jnp.take_along_axis(
            jnp.broadcast_to(win[s:s + 1, :128], (_WTILE, 128)),
            lcq, axis=1)
        for qq in range(1, w8 // 128):
            part = jnp.take_along_axis(
                jnp.broadcast_to(
                    win[s:s + 1, qq * 128:(qq + 1) * 128], (_WTILE, 128)),
                lcq, axis=1)
            cand = jnp.where(lc // 128 == qq, part, cand)
        vseg = jnp.where(sub == s, cand, vseg)
    o_ref[...] = vals_ref[...].astype(jnp.float32) * vseg


@functools.partial(jax.jit, static_argnames=("w",))
def window_product(
    vals: jax.Array,            # (R, 128) f32/bf16 coefficients
    rel: jax.Array,             # (R, 128) int32, window-relative, [0, w)
    ws: jax.Array,              # (R // _WTILE,) int32 w-ALIGNED starts
    pp: jax.Array,              # (R // _WTILE,) int32 panel id per tile
    nxt: jax.Array,             # (R // _WTILE,) int32 first tile of the
                                #   next panel (own index in the last)
    vtab: jax.Array,            # (n_pad,) f32, n_pad >= max(ws) + w,
                                #   n_pad a multiple of 1024
    w: int = 1024,
) -> jax.Array:
    """products[r, l] = vals[r, l] * vtab[ws[r//8] + rel[r, l]].

    The stream tier's v-gather: each _WTILE-row tile's sources live in
    one w-scalar window (the plan guarantees it; starts are w-aligned
    panels shared by all the panel's tiles); the window is DMAed once
    per PANEL (double-buffered by panel parity) and every lane resolves
    with a lane shuffle + sublane shuffle pair. Padding slots carry
    rel == 0 and vals == 0, so the gathered lane is multiplied away.
    """
    r = vals.shape[0]
    assert r % _WTILE == 0 and vals.shape[1] == 128
    assert w % 1024 == 0, w
    assert vtab.shape[0] % 1024 == 0, vtab.shape
    # sublane-tiled view: vtab2[s, c] = vtab[c * 8 + s]
    vtab2 = vtab.reshape(-1, 8).T
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(r // _WTILE,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((_WTILE, 128), lambda t, *_: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_WTILE, 128), lambda t, *_: (t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_WTILE, 128), lambda t, *_: (t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, 8, w // 8), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(_window_product_kernel, w=w)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((r, 128), jnp.float32),
        grid_spec=grid_spec,
        interpret=jax.default_backend() != "tpu",
    )(ws, pp, nxt, vtab2, vals, rel)
