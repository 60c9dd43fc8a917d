"""Pallas windowed SpGEMM numeric kernel — in-VMEM operand gathers
fused with the block products.

The TPU analogue of the reference's staged operand loads
(ref: src/bmSparse_SPGEMM.cu:164-201, shmem_load :152-162): where the
CUDA kernel stages each task's operand tiles through shared memory at
L2 gather speed, this kernel stages a narrow window of each operand
table in VMEM once per 8-chunk tile and resolves every slot's tile with
in-register lane shuffles.

Why this beats both XLA formulations on v5e (measured costs):
  * full-table lane gathers run at ~0.4 Gidx/s and collapse to
    ~0.09 Gidx/s past ~100 MB tables — 2.4M-slot groups (band2M) spend
    ~60 ms just gathering;
  * the round-3 windowed XLA path (ops/spgemm.py::_win_gather) restores
    the fast rate but still pays ~2.5 ns per index plus a window copy;
  * an in-VMEM `take_along_axis` is one vector shuffle per 128 slots
    per 128-lane window quarter — the gather disappears into the FMA
    stream.

The planner (ops/spgemm.py::_plan_pallas_windows) checks, per K-group,
that every 8-chunk tile's operand indices fit one W-row window on both
sides (W <= 2048, bucketed per group); slot tables are stored
window-RELATIVE (sentinels remapped to a huge value the quarter-select
never matches, so padding slots contribute exact zeros). Groups that
don't fit — scattered tasks, hub rows — keep the XLA paths.

Pipeline: relative-index blocks stream through the automatic grid
pipeline; the two operand windows are fetched with hand-rolled
double-buffered DMAs (tile i+1's windows are in flight while tile i
computes across its K steps); the (64, t, 128) output block stays
resident across the K dimension and is written to HBM once.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_CHUNKS = 8        # chunk slots per grid step — ALWAYS 8, so the
                       # output block's second-minor dim is a sublane
                       # multiple; the planner's t-ladder packs fewer
                       # REAL chunks per tile (rest sentinel-padded)
                       # when tighter windows are needed
W_MAX = 4096           # max window rows per side (64*4096*4 B * 2 bufs
                       # * 2 operands = 8 MB of the ~16 MB VMEM)
_VMEM_WINDOW_BUDGET = 10 * 1024 * 1024   # both sides' double buffers
_SENT_REL = 1 << 24    # window-relative sentinel (never matches a quarter)


def window_vmem_bytes(wa: int, wb: int, itemsize: int = 4) -> int:
    return 2 * 64 * (wa + wb) * itemsize


def _gather_window(win, idx, w: int, t: int):
    """(64, w) window + (t, 128) relative indices -> (64, t, 128) f32
    gathered values.

    Explicit quarter-select lowering: one in-register lane shuffle per
    (chunk, window quarter) + a select. Mosaic lowers take_along_axis
    only when the index array matches the operand shape exactly (its
    gather rule asserts indices.shape == operand.shape + (1,) — found
    the hard way on v5e), so every gather here is a (64, 128) x
    (64, 128) dynamic_gather over one vreg row. Out-of-window indices
    (sentinels) select nothing and stay exactly zero.
    """
    outs = []
    for tt in range(t):
        lane = idx[tt].reshape(1, 128)
        q = jnp.broadcast_to(lane // 128, (64, 128))
        r = jnp.broadcast_to(lane % 128, (64, 128))
        out = jnp.zeros((64, 128), jnp.float32)
        for j in range(w // 128):
            part = jnp.take_along_axis(
                win[:, j * 128:(j + 1) * 128], r, axis=1
            ).astype(jnp.float32)
            out = jnp.where(q == j, part, out)
        outs.append(out)
    return jnp.stack(outs, axis=1)


def _spgemm_window_kernel(
    wsa_ref,                    # scalar prefetch: (ntiles,) A window starts
    wsb_ref,                    # scalar prefetch: (ntiles,) B window starts
    a_t_ref,                    # ANY/HBM: (64, nba_pad) f32/bf16
    b_t_ref,                    # ANY/HBM: (64, nbb_pad) f32/bf16
    ra_ref,                     # VMEM block: (1, 1, t, 128) int32 rel A idx
    rb_ref,                     # VMEM block: (1, 1, t, 128) int32 rel B idx
    o_ref,                      # VMEM block: (64, t, 128) f32, revisited
    wina_ref,                   # scratch: (2, 64, wa) double buffer
    winb_ref,                   # scratch: (2, 64, wb)
    sema_ref,                   # scratch: (2,) DMA semaphores
    semb_ref,                   # scratch: (2,)
    *,
    nk: int,
    t: int,
    wa: int,
    wb: int,
):
    i = pl.program_id(0)
    kk = pl.program_id(1)
    ntiles = pl.num_programs(0)

    def dma(tbl_ref, win_ref, sem_ref, ws_ref, slot, tile, w):
        # window starts are 128-aligned by the planner; without the
        # multiple_of hint Mosaic refuses the HBM slice ("Failed to
        # prove that a tile index in dimension 1 is divisible by the
        # tiling (128)" — the round-3 TPU crash)
        return pltpu.make_async_copy(
            tbl_ref.at[:, pl.ds(pl.multiple_of(ws_ref[tile], 128), w)],
            win_ref.at[slot],
            sem_ref.at[slot],
        )

    # double-buffered windows: tile i's pair was started during tile i-1
    # (or right here for i == 0); tile i+1's fetch overlaps all of i's
    # K steps.
    @pl.when((i == 0) & (kk == 0))
    def _():
        dma(a_t_ref, wina_ref, sema_ref, wsa_ref, 0, 0, wa).start()
        dma(b_t_ref, winb_ref, semb_ref, wsb_ref, 0, 0, wb).start()

    @pl.when(kk == 0)
    def _():
        dma(a_t_ref, wina_ref, sema_ref, wsa_ref, i % 2, i, wa).wait()
        dma(b_t_ref, winb_ref, semb_ref, wsb_ref, i % 2, i, wb).wait()

    @pl.when((kk == 0) & (i + 1 < ntiles))
    def _():
        nxt = (i + 1) % 2
        dma(a_t_ref, wina_ref, sema_ref, wsa_ref, nxt, i + 1, wa).start()
        dma(b_t_ref, winb_ref, semb_ref, wsb_ref, nxt, i + 1, wb).start()

    # bf16 windows cast to f32 in VMEM once per tile: Mosaic's lane
    # gather requires index/result bitwidths to match ("Gather indices
    # and result have different bitwidths" on 16-bit operands), and the
    # products accumulate f32 anyway; HBM still streams 16-bit windows
    wina = wina_ref[i % 2]
    winb = winb_ref[i % 2]
    if wina.dtype != jnp.float32:
        wina = wina.astype(jnp.float32)
    if winb.dtype != jnp.float32:
        winb = winb.astype(jnp.float32)
    va = _gather_window(wina, ra_ref[0, 0], wa, t)
    vb = _gather_window(winb, rb_ref[0, 0], wb, t)
    x = [va[s] for s in range(64)]
    y = [vb[s] for s in range(64)]
    # per-task 8x8x8 block product, K-accumulated in the resident output
    # (slot layouts: A row-major [i*8+j], B transposed-load [j*8+m] —
    # identical to spgemm_kernel._sell_kernel)
    for i8 in range(8):
        for m in range(8):
            acc = x[i8 * 8] * y[m]
            for j in range(1, 8):
                acc = acc + x[i8 * 8 + j] * y[j * 8 + m]
            s = i8 * 8 + m

            @pl.when(kk == 0)
            def _(acc=acc, s=s):
                o_ref[s] = acc

            if nk > 1:
                @pl.when(kk != 0)
                def _(acc=acc, s=s):
                    o_ref[s] = o_ref[s] + acc


@functools.partial(jax.jit, static_argnames=("kg", "wa", "wb"))
def _window_products(
    a_tp: jax.Array,             # (64, nba_pad) padded transposed tiles
    b_tp: jax.Array,             # (64, nbb_pad)
    ra: jax.Array,               # (ntiles, kg, t, 128) int32 rel indices
    rb: jax.Array,
    wsa: jax.Array,              # (ntiles,) int32 window starts
    wsb: jax.Array,
    kg: int,
    wa: int,
    wb: int,
) -> jax.Array:
    ntiles, _, t, _ = ra.shape
    interpret = jax.default_backend() != "tpu"
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(ntiles, kg),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                (1, 1, t, 128), lambda i, kk, wsa, wsb: (i, kk, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, t, 128), lambda i, kk, wsa, wsb: (i, kk, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (64, t, 128), lambda i, kk, wsa, wsb: (0, i, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, 64, wa), a_tp.dtype),
            pltpu.VMEM((2, 64, wb), b_tp.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(
        _spgemm_window_kernel, nk=kg, t=t, wa=wa, wb=wb)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((64, ntiles * t, 128), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(wsa, wsb, a_tp, b_tp, ra, rb)


def pad_table(flat_t: jax.Array, target_lanes: int) -> jax.Array:
    """Pad a (64, nb+1) transposed operand table on lanes to the plan's
    padded width so every window DMA is in bounds (padding reads zeros
    — the sentinel column already is one)."""
    lanes = flat_t.shape[1]
    if target_lanes <= lanes:
        return flat_t
    return jnp.concatenate(
        [flat_t, jnp.zeros((64, target_lanes - lanes), flat_t.dtype)],
        axis=1)


def numeric_window_pallas(
    a_tp, b_tp, ra, rb, wsa, wsb, kg: int, wa: int, wb: int,
    t_real: int = TILE_CHUNKS,
) -> jax.Array:
    """One K-group's products through the windowed kernel.

    ra/rb are WINDOW-RELATIVE slot tables (plan data, sentinel
    _SENT_REL) in the kernel's (ntiles, K, 8, 128) layout; tiles carry
    t_real real chunks (the planner's window-tightness ladder) and
    8 - t_real sentinel-padded slots, dropped here. Returns
    (ntiles*t_real*128, 64) row-major sigma-order C tiles, matching
    ops/spgemm.py::_numeric_sell_group.
    """
    out = _window_products(a_tp, b_tp, ra, rb, wsa, wsb, kg, wa, wb)
    ntiles = ra.shape[0]
    if t_real < TILE_CHUNKS:
        out = out.reshape(64, ntiles, TILE_CHUNKS, 128)[:, :, :t_real]
        out = out.reshape(64, ntiles * t_real, 128)
    return jnp.transpose(out, (1, 2, 0)).reshape(-1, 64)
