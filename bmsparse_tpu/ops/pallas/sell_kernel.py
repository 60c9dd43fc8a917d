"""Pallas SELL SpMV kernel — VMEM-resident v windows + hardware lane
shuffles for the scattered/irregular tier.

The TPU analogue of the reference's one-size-fits-all gather kernel
(ref: src/bmSparse_SPMV.cu:84-150): where the GPU kernel gathers v
through the L2/TLB at device gather speed, this kernel stages a narrow
v window in VMEM once per chunk and resolves every slot's v segment
with an in-register `dynamic_gather` lane shuffle.

Why this beats the XLA path on clustered structures: XLA's HBM gather
costs ~2.5 ns per INDEX regardless of row width (measured on v5e:
lane-8 / row-64 / lane-64 all 0.40 Gidx/s on web256k's 2.55M-slot
stream — see ops/spmv.py::sell_apply). A VMEM-resident `take_along_axis`
on a (cw, W) tile is a vector shuffle: one vreg op per 128 gathered
slots, ~100x cheaper per index. The price is that all of a chunk's
block columns must fit one W-column-unit window, which the planner
(ops/plan.py) verifies per K-group at prepare time — banded / locally
clustered structures (road networks, FEM meshes, stencils that miss
the DIA tier) qualify; webgraph hub rows do not and keep the XLA
gather.

Pipeline: dense tiles and relative-index tiles stream through the
automatic grid pipeline; the v window is fetched with a hand-rolled
double-buffered DMA (window c+1 is in flight while chunk c computes),
so the ~1 us DMA latency never serializes against the FMAs. Deep
groups whose (cw, kg) dense block would blow the VMEM budget run a
second grid dimension over k-slices, accumulating into the resident
output block (the index map revisits (c, 0, 0), so the partial sums
never round-trip HBM).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Window width in column units (one unit = cw scalars of v). 256 = two
# 128-lane vreg rows: the gather is a two-quarter select (two lane
# shuffles + one select). Window starts must be 128-ALIGNED — Mosaic
# requires the DMA's dynamic lane offset to be provably 128-divisible —
# and alignment eats up to 127 units of a 128-wide window, so 256 keeps
# every previously-eligible chunk eligible. The planner pads the v
# table's lane dim to >= W.
WINDOW_UNITS = 256

# Per-chunk VMEM budget for the double-buffered dense/idx blocks plus
# the window pair; k-slicing keeps every group under it.
_VMEM_BUDGET = 6 * 1024 * 1024


def ncu_padded(ncu: int) -> int:
    """Lane padding of the (cw, ncu) v table: at least one all-zero
    sentinel column past ncu (the XLA gather path indexes it) and enough
    room that every window start in [0, ncu_pad - W] stays in bounds."""
    return max(WINDOW_UNITS, -(-(ncu + 1) // 128) * 128)


def k_slice(cw: int, kg: int, itemsize: int = 4) -> int:
    """Largest k-slice whose double-buffered blocks fit the VMEM budget
    (0 if even one slot per slice doesn't — cannot happen for cw <= 64).
    16-bit dense tiles (bf16) keep the k-slice even so every block's
    trailing (ks*8, 128) face stays a multiple of the packed-sublane
    tile."""
    win = 2 * cw * WINDOW_UNITS * 4
    per_k = 2 * (cw * 8 * 128 * itemsize + 128 * 4)  # dense + idx, 2 bufs
    ks = (_VMEM_BUDGET - win) // per_k
    ks = max(0, min(kg, ks))
    if itemsize < 4 and ks % 2:
        ks = ks - 1 if ks > 1 else (2 if kg >= 2 else 0)
    return ks


def group_vmem_ok(cw: int, kg: int, itemsize: int = 4) -> bool:
    """Whether the group can run the windowed kernel at all (k-slicing
    bounds the block size, so only degenerate shapes are refused; bf16
    single-K groups stay on the XLA gather — their (8, 128) bf16 face
    is below the packed-sublane tile)."""
    if itemsize < 4 and kg < 2:
        return False
    return k_slice(cw, kg, itemsize) >= 1


def _sell_window_kernel(
    ws_ref,                     # scalar prefetch: (cap,) int32 window starts
    vtab_ref,                   # ANY/HBM: (cw, ncu_pad) f32
    rel_ref,                    # VMEM block: (1, ks, 1, 128) int32 rel bcol
    dense_ref,                  # VMEM block: (cw, 1, ks*8, 128) f32/bf16
    o_ref,                      # VMEM block: (1, 8, 128) f32, revisited
    win_ref,                    # scratch: (2, cw, W) f32 double buffer
    sem_ref,                    # scratch: (2,) DMA semaphores
    *,
    kg: int,
    cw: int,
    ks: int,
):
    c = pl.program_id(0)
    s = pl.program_id(1)
    cap = pl.num_programs(0)
    w = win_ref.shape[2]

    def win_dma(slot, chunk):
        # starts are 128-aligned by the planner; the hint lets Mosaic
        # prove the HBM lane slice is tileable
        return pltpu.make_async_copy(
            vtab_ref.at[:, pl.ds(pl.multiple_of(ws_ref[chunk], 128), w)],
            win_ref.at[slot],
            sem_ref.at[slot],
        )

    # double buffer: chunk c's window was started during chunk c-1 (or
    # right here for c == 0); chunk c+1's fetch is kicked off as soon as
    # c's has landed, so it overlaps all of c's FMAs.
    @pl.when((c == 0) & (s == 0))
    def _():
        win_dma(0, 0).start()

    @pl.when(s == 0)
    def _():
        win_dma(c % 2, c).wait()

    @pl.when((s == 0) & (c + 1 < cap))
    def _():
        win_dma((c + 1) % 2, c + 1).start()

    win = win_ref[c % 2]                                 # (cw, W)

    acc = jnp.zeros((8, 128), jnp.float32)
    for k in range(ks):
        rel = rel_ref[0, k, 0][None, :]                  # (1, 128), [0, W)
        idx = jnp.broadcast_to(rel % 128, (cw, 128))
        # two-quarter select: one lane shuffle per 128-lane window half
        vseg = jnp.take_along_axis(win[:, :128], idx, axis=1)
        for q in range(1, w // 128):
            part = jnp.take_along_axis(
                win[:, q * 128:(q + 1) * 128], idx, axis=1)
            vseg = jnp.where(
                jnp.broadcast_to(rel // 128, (cw, 128)) == q, part, vseg)
        # dense[w, k*8+i, lane] * v[w of slot(k, lane)] summed over w;
        # the last k-slice's tail blocks read edge padding — masked.
        dk = dense_ref[:, 0, k * 8:(k + 1) * 8, :]       # (cw, 8, 128)
        term = jnp.sum(
            dk.astype(jnp.float32) * vseg[:, None, :], axis=0)
        acc = acc + jnp.where(s * ks + k < kg, term, 0.0)

    @pl.when(s == 0)
    def _():
        o_ref[0] = acc

    @pl.when(s > 0)
    def _():
        o_ref[0] = o_ref[0] + acc


@functools.partial(jax.jit, static_argnames=("kg", "cw"))
def sell_window_group(
    dense_g: jax.Array,          # (cw, cap, kg, 8, 128) f32/bf16
    rel_g: jax.Array,            # (cap, kg, 128) int32
    ws_g: jax.Array,             # (cap,) int32
    vtab: jax.Array,             # (cw, ncu_pad) f32, ncu_pad >= W
    kg: int,
    cw: int,
) -> jax.Array:
    """One SELL K-group's contribution, windowed: (cap, 8, 128) f32."""
    cap = dense_g.shape[1]
    w = WINDOW_UNITS
    ks = k_slice(cw, kg, dense_g.dtype.itemsize)
    nks = -(-kg // ks)
    interpret = jax.default_backend() != "tpu"
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(cap, nks),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),        # vtab stays in HBM
            # unit dim -2 so the (ks, 1, 128) tail obeys the TPU
            # block-shape rule when ks doesn't divide by 8
            pl.BlockSpec(
                (1, ks, 1, 128), lambda c, s, ws: (c, s, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            # dense flattened to a (ks*8, 128) trailing face — a
            # sublane multiple of 8 (f32) / 16 (bf16: ks kept even)
            pl.BlockSpec(
                (cw, 1, ks * 8, 128), lambda c, s, ws: (0, c, s, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 8, 128), lambda c, s, ws: (c, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, cw, w), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(_sell_window_kernel, kg=kg, cw=cw, ks=ks)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((cap, 8, 128), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(ws_g, vtab, rel_g.reshape(cap, kg, 1, 128),
      dense_g.reshape(cw, cap, kg * 8, 128))
