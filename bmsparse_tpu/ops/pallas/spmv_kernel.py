"""Pallas SpMV kernels — the hand-scheduled analogue of the reference's
spmv_kernel/spmv_kernel_new (ref: src/bmSparse_SPMV.cu:84-189).

The DIA tier is the hot loop of the tiered plan (ops/plan.py): ndiags
shifted fused multiply-adds. Two layout insights drive this kernel:

  1. the vector and the diagonal strip live in (8, n/8) lane-major 2-D
     form — element e sits at [e % 8, e // 8] — so every VPU op uses all
     8 sublanes (a flat (1, n) layout wastes 7/8 of each vreg; measured:
     the flat form is compute-bound at ~245 GB/s);
  2. a shift by o = 8*m + r becomes two static lane-rotations (m, m+1),
     one static sublane-rotation (r), and a sublane select — all
     in-register, while the strip streams HBM->VMEM double-buffered.

The padded vector stays resident in VMEM; the grid walks lane-tiles of u.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DIA_TILE_LANES = 2048  # lanes (of 8 sublanes) of u per grid step: 64 KB f32


def _dia_kernel(v_ref, dia_ref, u_ref, *, offsets, lead_lanes, tc):
    i = pl.program_id(0)
    w = tc + 128
    acc = jnp.zeros((8, tc), jnp.float32)
    s_iota = jax.lax.broadcasted_iota(jnp.int32, (8, tc), 0)
    for d, o in enumerate(offsets):  # static unroll over diagonals
        m, r = divmod(o, 8)          # element shift -> (lane, sublane)
        base = i * tc + lead_lanes + m
        q, rem = divmod(base, 128) if isinstance(base, int) else (None, None)
        # base = i*tc + lead_lanes + m with tc, lead_lanes multiples of
        # 128 -> alignment remainder is m's (static)
        mq, mrem = divmod(m, 128)
        start = pl.multiple_of(i * tc + lead_lanes + mq * 128, 128)
        win = v_ref[:, pl.ds(start, w)]
        # lane-rotate left by mrem and mrem+1 (static shifts)
        a0 = pltpu.roll(win, w - mrem, axis=1) if mrem else win
        a1 = pltpu.roll(win, w - mrem - 1, axis=1)
        if r:
            # sublane-rotate left by r: b[s] = a[(s+r) % 8]
            b0 = pltpu.roll(a0, 8 - r, axis=0)
            b1 = pltpu.roll(a1, 8 - r, axis=0)
            vs = jnp.where(s_iota < 8 - r, b0[:, :tc], b1[:, :tc])
        else:
            vs = a0[:, :tc]
        acc = acc + dia_ref[d] * vs
    u_ref[:, :] = acc


@functools.partial(jax.jit, static_argnames=("offsets", "lead_lanes"))
def dia_spmv_pallas(
    dia2: jax.Array, vx2: jax.Array, offsets: tuple, lead_lanes: int
) -> jax.Array:
    """u2[s, c] = sum_d dia2[d, s, c] * vx2-element (c + lead_lanes)*8 + s
    + offsets[d].

    dia2: (nd, 8, npad/8) f32 lane-major diagonals; vx2: (8, L) f32
    lane-major zero-padded vector. Returns u2 (8, npad/8).
    """
    nd, _, nlanes = dia2.shape
    tc = min(DIA_TILE_LANES, max(128, nlanes))
    nt = -(-nlanes // tc)
    nl_t = nt * tc
    if nl_t != nlanes:
        dia2 = jnp.pad(dia2, ((0, 0), (0, 0), (0, nl_t - nlanes)))
    max_m = max(max(offsets), 0) // 8 + 1
    need = lead_lanes + nl_t + (max_m + 127) // 128 * 128 + 128
    if vx2.shape[1] < need:
        vx2 = jnp.pad(vx2, ((0, 0), (0, need - vx2.shape[1])))

    interpret = jax.default_backend() != "tpu"
    u2 = pl.pallas_call(
        functools.partial(
            _dia_kernel, offsets=offsets, lead_lanes=lead_lanes, tc=tc
        ),
        grid=(nt,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # whole vx2 resident
            pl.BlockSpec(
                (nd, 8, tc), lambda i: (0, 0, i), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (8, tc), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((8, nl_t), jnp.float32),
        interpret=interpret,
    )(vx2, dia2)
    return u2[:, :nlanes]
