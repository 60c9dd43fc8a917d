"""Pallas SpGEMM numeric kernel — the hand-scheduled analogue of the
reference's tensor-core variants multiplyV11-V14
(ref: src/bmSparse_SPGEMM.cu:295-733).

Why this is the TPU analogue of WMMA packing, not a literal MXU port
-------------------------------------------------------------------
The reference packs 8x8 half blocks into 16x16 WMMA fragments (2 blocks +
2 tasks per mma issue, ref :422-532) because Ampere tensor cores give
~8x the fp16 FMA throughput of the SIMT lanes — its numeric phase is
*compute*-bound on fragment math. On TPU the per-task block product
C += A(8x8) @ B(8x8) has arithmetic intensity 512 MACs / 128 loaded
elements = 4 MACs/element, far below the v5e MXU ridge point (~250
FLOP/byte): the phase is *memory*-bound, and MXU systolic tiles cannot
help because every task's operands are distinct (the MXU pays off only
when an operand tile is reused across ~128 outputs; scattered tasks have
reuse factor 8, which the VPU broadcast already exploits). The
speed-of-light design is therefore: one gather pass of the operand tiles,
then a single fused VPU pass that does all 512 FMAs per task and the
K-axis reduction without materializing any intermediate — exactly what
this kernel does. The XLA formulation of the same math
(ops/spgemm.py:_numeric_sell_slab) materializes the gathered/transposed
operand tensors and the 8-step accumulator chain through HBM (~6x the
minimum traffic, measured 10.1 ms on band256k A-squared); this kernel
fuses them in VMEM/registers.

Data layout
-----------
Operands arrive as (64, K, CH, 128) f32: axis 0 is the block slot
(row-major i*8+j for A, j*8+m for B), axis 1 the task rank within the
C block, axis 2 the sigma chunk, axis 3 the lane (= sigma position % 128,
one C block per lane). This is precisely the layout the XLA lane-gather
`take(a_t, ta, axis=1)` produces — no transpose between gather and
kernel. The grid walks (chunk-tile, k); the output block (64, T, 128)
stays resident across the k steps and accumulates (the Pallas-TPU
sequential-grid reduction idiom), so each C tile is written to HBM once.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SELL_TILE_CHUNKS = 8  # sigma chunks per grid step (block = 64*T*128 f32)


def _sell_kernel(ga_ref, gb_ref, out_ref, *, nk):
    kk = pl.program_id(1)
    # loads cast to f32 in registers (bf16 operands keep half HBM traffic,
    # f32 accumulation — the reference's half-in/float-out regime)
    x = [ga_ref[s, 0].astype(jnp.float32) for s in range(64)]  # (T, 128)
    y = [gb_ref[s, 0].astype(jnp.float32) for s in range(64)]
    for i in range(8):
        for m in range(8):
            acc = x[i * 8] * y[m]
            for j in range(1, 8):
                acc = acc + x[i * 8 + j] * y[j * 8 + m]
            s = i * 8 + m

            @pl.when(kk == 0)
            def _(acc=acc, s=s):
                out_ref[s] = acc

            if nk > 1:
                @pl.when(kk != 0)
                def _(acc=acc, s=s):
                    out_ref[s] = out_ref[s] + acc


@functools.partial(jax.jit, static_argnames=("t",))
def _sell_products(ga: jax.Array, gb: jax.Array, t: int) -> jax.Array:
    """(64, k, ch, 128) gathered operands -> (64, ch, 128) C tiles."""
    _, k, ch, _ = ga.shape
    interpret = jax.default_backend() != "tpu"
    out = pl.pallas_call(
        functools.partial(_sell_kernel, nk=k),
        grid=(ch // t, k),
        in_specs=[
            pl.BlockSpec(
                (64, 1, t, 128), lambda i, kk: (0, kk, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (64, 1, t, 128), lambda i, kk: (0, kk, i, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (64, t, 128), lambda i, kk: (0, i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((64, ch, 128), jnp.float32),
        interpret=interpret,
    )(ga, gb)
    return out


@jax.jit
def _gather_kc(a_t: jax.Array, ta_kc: jax.Array) -> jax.Array:
    return jnp.take(a_t, ta_kc, axis=1)


def numeric_sell_pallas(a_t, b_t, ta, tb) -> jax.Array:
    """Task-SELL numeric phase for one K-group via the fused kernel.

    a_t/b_t: (64, nb+1) transposed dense tiles, zero sentinel column.
    ta/tb: (ch, K, 128) int32 slot operand indices.
    Returns (ch*128, 64) row-major dense C tiles (sigma order), matching
    ops/spgemm.py:_numeric_sell_group.
    """
    ch, k, _ = ta.shape
    t = min(SELL_TILE_CHUNKS, ch)
    nch = -(-ch // t) * t
    if nch != ch:
        pad_a = jnp.full((nch - ch, k, 128), a_t.shape[1] - 1, jnp.int32)
        pad_b = jnp.full((nch - ch, k, 128), b_t.shape[1] - 1, jnp.int32)
        ta = jnp.concatenate([ta, pad_a])
        tb = jnp.concatenate([tb, pad_b])
    ta_kc = jnp.moveaxis(ta, 1, 0)                 # (k, nch, 128)
    tb_kc = jnp.moveaxis(tb, 1, 0)
    ga = _gather_kc(a_t, ta_kc)                    # (64, k, nch, 128)
    gb = _gather_kc(b_t, tb_kc)
    out = _sell_products(ga, gb, t)                # (64, nch, 128)
    # (64, nch, 128) -> (nch*128, 64) row-major for the compress stage
    c_rows = jnp.transpose(out, (1, 2, 0)).reshape(nch * 128, 64)
    return c_rows[: ch * 128]


def numeric_pallas(a_flat, b_flat, a_idx, b_idx, c_seg, num_c_blocks):
    """Compatibility entry for the chunked (task-stream) formulation:
    falls back to the XLA segment-sum path — the SELL-layout kernel above
    is the supported Pallas surface (it needs the planner's slot layout).
    """
    from ..spgemm import _numeric_xla

    return _numeric_xla(a_flat, b_flat, a_idx, b_idx, c_seg, num_c_blocks)
