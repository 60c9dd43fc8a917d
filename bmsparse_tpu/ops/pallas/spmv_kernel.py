"""Pallas SpMV kernels — the hand-scheduled analogue of the reference's
spmv_kernel/spmv_kernel_new (ref: src/bmSparse_SPMV.cu:84-189).

The DIA tier is the hot loop of the tiered plan (ops/plan.py): ndiags
shifted fused multiply-adds. Layout insights driving this kernel (v3):

  1. everything lives in the NATURAL (rows, 128) layout — element e at
     [e // 128, e % 128], which is exactly XLA's tiling of a 1-D array, so
     the reshape from/to flat vectors is free. (The earlier lane-major
     (8, n/8) variant ran the kernel at >650 GB/s but paid ~30 us of XLA
     lane<->sublane transposes around it.)
  2. a shift by o = 128*m + rem becomes: one static in-register lane
     rotation (rem) of an aligned row-window, plus two static row slices
     (m, m+1) selected by lane — all register ops at full vreg utilization.

The padded vector stays resident in VMEM; the dia strip streams
HBM->VMEM double-buffered by the grid pipeline.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# 128-lane rows of u per grid step. NOTE an attempted round-2 sweep to
# 1024 was invalid (the sweep mutated this global without changing the
# jit key, so every trial reused the first executable) and tile 1024
# actually exceeds the 16 MB scoped-VMEM limit at 2M rows x 17 diagonals
# (the resident padded vector alone is ~8.4 MB f32). 256 is the known
# good operating point.
DIA_TILE_ROWS = 256


def _dia_kernel(v_ref, dia_ref, u_ref, *, offsets, lead_rows, tr, wpad):
    i = pl.program_id(0)
    w = tr + 2 * wpad
    acc = jnp.zeros((tr, 128), jnp.float32)
    l_iota = jax.lax.broadcasted_iota(jnp.int32, (tr, 128), 1)

    decomp = [divmod(o, 128) for o in offsets]          # (m, rem) per diag
    # one aligned window load per tile; all diagonals slice from it
    start = pl.multiple_of(i * tr + lead_rows - wpad, 8)
    win = v_ref[pl.ds(start, w), :]

    for d, (m, rem) in enumerate(decomp):
        if rem:
            rot = pltpu.roll(win, 128 - rem, axis=1)    # left by rem lanes
            b0 = rot[wpad + m : wpad + m + tr]
            b1 = rot[wpad + m + 1 : wpad + m + 1 + tr]
            vs = jnp.where(l_iota < 128 - rem, b0, b1)
        else:
            vs = win[wpad + m : wpad + m + tr]
        acc = acc + dia_ref[d] * vs
    u_ref[:, :] = acc


@functools.partial(jax.jit, static_argnames=("offsets", "lead_rows"))
def dia_spmv_pallas(
    dia: jax.Array, vxn: jax.Array, offsets: tuple, lead_rows: int
) -> jax.Array:
    """u[q, l] = sum_d dia[d, q, l] * vxn-element (lead_rows+q)*128 + l
    + offsets[d].

    dia: (nd, R, 128) f32 natural-layout diagonals; vxn: (Rv, 128) f32
    zero-padded vector. lead_rows must be a multiple of 8. Returns
    u (R, 128).
    """
    nd, r_rows, _ = dia.shape
    tr = min(DIA_TILE_ROWS, max(8, -(-r_rows // 8) * 8))
    nt = -(-r_rows // tr)
    r_t = nt * tr
    if r_t != r_rows:
        dia = jnp.pad(dia, ((0, 0), (0, r_t - r_rows), (0, 0)))
    max_m = max(abs(o) // 128 + 1 for o in offsets)
    wpad = -(-max_m // 8) * 8                            # aligned overhang
    need = lead_rows + r_t + wpad + 8
    if vxn.shape[0] < need:
        vxn = jnp.pad(vxn, ((0, need - vxn.shape[0]), (0, 0)))
    if lead_rows % 8 or lead_rows < wpad:
        raise ValueError("lead_rows must be a multiple of 8 and >= wpad")

    interpret = jax.default_backend() != "tpu"
    u = pl.pallas_call(
        functools.partial(
            _dia_kernel, offsets=offsets, lead_rows=lead_rows,
            tr=tr, wpad=wpad,
        ),
        grid=(nt,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # whole vxn resident
            pl.BlockSpec(
                (nd, tr, 128), lambda i: (0, i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (tr, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((r_t, 128), jnp.float32),
        interpret=interpret,
    )(vxn, dia)
    return u[:r_rows]
