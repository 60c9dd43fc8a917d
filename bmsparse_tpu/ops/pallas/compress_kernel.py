"""Pallas MXU segment-compress — the SpGEMM output-packing engine.

The compress stage places each C block's packed values (a 128-lane row
`w` from ops/spgemm._pack_rows, already rotated to its output lane
positions) into the dense output at 128-lane row `b_row = off // 64`.
The round 2-4 implementation is one XLA row scatter-add — the measured
~2.2 ms floor at 164k blocks (v5e row scatters run ~0.07 G rows/s, cost
per row-tile touched). The fold-compress alternative (gather J
contributors per output row) lost too: row GATHERS measure 0.031 G
rows/s (scratch/exp_sorts.json S5).

This kernel replaces the scatter with matrix multiplies. Within one
sigma K class the stacked rows keep natural block order (round-4
secondary sort key), so b_row is NON-DECREASING and the contributors of
an output-row window form one contiguous input run. Per step (one
output window x one input chunk):

    S[q, r] = 1  iff  b_row[r] == window_base + q      (iota compare)
    out[window] += S @ w_chunk                         (MXU)

— the one-hot matmul is the TPU's scatter engine. The grid is a FLAT
prefetched step list (window id, chunk id, valid) so no step fetches a
block it will not use; every window appears at least once (its output
block must be initialized) and consecutive steps share the window, so
the output block accumulates in VMEM and writes HBM once.

The reference's analogue is the per-warp bit-order scatter of its
numeric kernels (ref: src/bmSparse_SPGEMM.cu:205-291) — free on a GPU,
structural on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

OUT_W = 512          # output rows (128-lane) per window
CH = 128             # input rows per chunk (class bases are 128-aligned)


def _compress_kernel(win_ref, chunk_ref, valid_ref, w_ref, br_ref, o_ref,
                     *, out_w):
    t = pl.program_id(0)
    first = jnp.logical_or(
        t == 0, win_ref[t] != win_ref[jnp.maximum(t - 1, 0)])

    @pl.when(first)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    @pl.when(valid_ref[t] > 0)
    def _():
        rel = br_ref[0, 0, :][None, :] - win_ref[t] * out_w   # (1, CH)
        q = jax.lax.broadcasted_iota(jnp.int32, (out_w, CH), 0)
        s = jnp.where(rel == q, 1.0, 0.0).astype(jnp.float32)
        part = jax.lax.dot_general(
            s, w_ref[0],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[...] = o_ref[...] + part.reshape(o_ref.shape)


@functools.partial(jax.jit, static_argnames=("t_pad",))
def segment_compress_class(
    w: jax.Array,        # (Rpad, 128) f32 packed rows, b_row sorted
    b_row: jax.Array,    # (Rpad,) int32 non-decreasing; pad -> 2**30
    t_pad: int,          # padded output rows (multiple of OUT_W)
) -> jax.Array:
    """One sigma class's contribution to the (t_pad, 128) output."""
    rpad = w.shape[0]
    assert rpad % CH == 0 and t_pad % OUT_W == 0
    nwin = t_pad // OUT_W
    n_chunks = rpad // CH
    win_step, chunk_step, valid_step, ts = _window_steps(
        b_row, rpad, t_pad)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(ts,),
        in_specs=[
            pl.BlockSpec(
                (1, CH, 128),
                lambda t, wi, ci, va: (ci[t], 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, CH),
                lambda t, wi, ci, va: (ci[t], 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, OUT_W, 128), lambda t, wi, ci, va: (wi[t], 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    out = pl.pallas_call(
        functools.partial(_compress_kernel, out_w=OUT_W),
        out_shape=jax.ShapeDtypeStruct((nwin, OUT_W, 128), jnp.float32),
        grid_spec=grid_spec,
        interpret=jax.default_backend() != "tpu",
    )(win_step, chunk_step, valid_step,
      w.reshape(n_chunks, CH, 128), b_row.reshape(n_chunks, 1, CH))
    return out.reshape(t_pad, 128)


def _window_steps(b_row: jax.Array, rpad: int, t_pad: int):
    """Flat (window, chunk, valid) step list for a sorted b_row.

    One small carrying sort extracts each present window's first input
    position; a reverse cummin fills absent windows; the per-window
    chunk runs expand into a step list padded to the static bound
    TS = n_chunks + 2*nwin + 8 (each window adds at most two partial
    chunks, plus one forced visit for empty windows). Padding rows
    carry b_row >= 2**30 and fall outside every window, so a forced or
    clamped chunk read contributes exact zeros.
    """
    nwin = t_pad // OUT_W
    n_chunks = rpad // CH
    win_id = jnp.clip(b_row // OUT_W, 0, nwin).astype(jnp.int32)
    first = jnp.concatenate(
        [jnp.ones((1,), bool), win_id[1:] != win_id[:-1]])
    big = jnp.int32(2**30)
    key = jnp.where(first, win_id, big)
    iota = jnp.arange(rpad, dtype=jnp.int32)
    kk, pos = jax.lax.sort((key, iota), num_keys=1)
    m = min(nwin + 1, rpad)
    starts = jnp.full((nwin + 2,), jnp.int32(rpad))
    starts = starts.at[jnp.minimum(kk[:m], nwin + 1)].set(
        pos[:m], mode="drop")
    # fill absent windows with the next present start (reverse cummin)
    starts = jax.lax.associative_scan(
        jnp.minimum, starts[: nwin + 1], reverse=True)
    s = starts[:nwin]
    e = starts[1:]
    sbase = jnp.minimum(s // CH, jnp.int32(max(n_chunks - 1, 0)))
    nch = jnp.maximum((e + CH - 1) // CH - sbase, 0).astype(jnp.int32)
    nch1 = jnp.maximum(nch, 1)

    ts = n_chunks + 2 * nwin + 8
    cum = jnp.cumsum(nch1)
    wstart = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                              cum.astype(jnp.int32)])
    t_iota = jnp.arange(ts, dtype=jnp.int32)
    # window of step t = #windows whose step range started at or before t
    win_step = jnp.clip(
        jnp.sum(t_iota[:, None] >= wstart[None, 1:], axis=1,
                dtype=jnp.int32),
        0, nwin - 1)
    rank = t_iota - jnp.take(wstart, win_step)
    chunk_step = jnp.clip(
        jnp.take(sbase, win_step) + rank, 0, max(n_chunks - 1, 0))
    valid_step = (
        (rank < jnp.take(nch, win_step)) & (t_iota < cum[-1])
    ).astype(jnp.int32)
    return win_step, chunk_step, valid_step, ts
