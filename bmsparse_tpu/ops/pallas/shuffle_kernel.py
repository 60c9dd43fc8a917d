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

# rows of x processed per grid step
_TILE = 8


def _rowwise_kernel(idx_ref, x_ref, o_ref, *, nq: int, g_out: int):
    x = x_ref[...]                                   # (TILE, W)
    for g in range(g_out):
        ix = idx_ref[:, g, :]                        # (TILE, 128)
        l = ix % 128
        q = ix // 128
        acc = jnp.zeros((_TILE, 128), jnp.float32)
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
    """
    r, w = x.shape
    assert w % 128 == 0 and r % _TILE == 0, (r, w)
    nq = w // 128
    kernel = functools.partial(_rowwise_kernel, nq=nq, g_out=g_out)
    return pl.pallas_call(
        kernel,
        grid=(r // _TILE,),
        in_specs=[
            pl.BlockSpec((_TILE, g_out, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE, w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_TILE, g_out, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r, g_out, 128), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(idx, x)


def _window_product_kernel(
    ws_ref,                     # scalar prefetch: (tiles,) int32 starts
    vtab_ref,                   # ANY/HBM: (1, n_pad) f32
    vals_ref,                   # VMEM: (TILE, 128) f32 coefficient tile
    rel_ref,                    # VMEM: (TILE, 128) int32 window-relative
    o_ref,                      # VMEM: (TILE, 128) f32 products
    win_ref,                    # scratch (2, 1, W) f32
    sem_ref,
    *,
    w: int,
):
    t = pl.program_id(0)
    nt = pl.num_programs(0)

    def dma(slot, tile):
        return pltpu.make_async_copy(
            vtab_ref.at[:, pl.ds(pl.multiple_of(ws_ref[tile], 128), w)],
            win_ref.at[slot],
            sem_ref.at[slot],
        )

    @pl.when(t == 0)
    def _():
        dma(0, 0).start()

    dma(t % 2, t).wait()

    @pl.when(t + 1 < nt)
    def _():
        dma((t + 1) % 2, t + 1).start()

    win = win_ref[t % 2]                              # (1, W)
    rel = rel_ref[...]                                # (TILE, 128)
    l = rel % 128
    q = rel // 128
    vseg = jnp.zeros((_TILE, 128), jnp.float32)
    for qq in range(w // 128):
        part = jnp.take_along_axis(
            jnp.broadcast_to(win[:, qq * 128:(qq + 1) * 128],
                             (_TILE, 128)),
            l, axis=1)
        vseg = jnp.where(q == qq, part, vseg)
    o_ref[...] = vals_ref[...].astype(jnp.float32) * vseg


@functools.partial(jax.jit, static_argnames=("w",))
def window_product(
    vals: jax.Array,            # (R, 128) f32/bf16 coefficients
    rel: jax.Array,             # (R, 128) int32, window-relative, [0, w)
    ws: jax.Array,              # (R // 8,) int32 128-aligned starts
    vtab: jax.Array,            # (n_pad,) f32, n_pad >= max(ws) + w
    w: int = 1024,
) -> jax.Array:
    """products[r, l] = vals[r, l] * vtab[ws[r//8] + rel[r, l]].

    The stream tier's v-gather: each 8-row tile's sources live in one
    w-scalar window (the plan guarantees it); the window is DMAed once
    per tile (double-buffered) and every lane resolves with the quarter
    select chain. Padding slots carry rel == 0 and vals == 0, so the
    gathered lane is multiplied away.
    """
    r = vals.shape[0]
    assert r % _TILE == 0 and vals.shape[1] == 128
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(r // _TILE,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((_TILE, 128), lambda t, ws_: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE, 128), lambda t, ws_: (t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_TILE, 128), lambda t, ws_: (t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, 1, w), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(_window_product_kernel, w=w)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((r, 128), jnp.float32),
        grid_spec=grid_spec,
        interpret=jax.default_backend() != "tpu",
    )(ws, vtab.reshape(1, -1), vals, rel)
