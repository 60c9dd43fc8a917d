"""Gather-as-matmul: TPU-native replacement for row gathers.

XLA lowers `jnp.take(table, idx, axis=0)` on TPU to a serial row-gather
(~6M rows/s measured on v5e — three orders of magnitude under HBM
bandwidth). The CUDA reference leans on exactly such gathers
(per-task block fetches, per-block v-segment fetches); a TPU-native design
must not.

`span_gather` exploits locality in the index stream instead: split `idx`
into fixed chunks; per chunk, `dynamic_slice` the table at the chunk's
minimum index (one contiguous DMA) and select rows with a one-hot matmul
on the MXU. A {0,1} selector matmul at Precision.HIGHEST is an exact
f32 selection (each output row sums exactly one product 1.0 * x, and the
bf16 hi+lo decomposition of x recombines to x exactly).

Requirements: every chunk's index span (max - min + 1) must be <= the
static `max_span`. Span is a per-matrix/per-task-list property; compute it
once with `chunk_span` (device reduction, one scalar sync) and bucket it.
Falls back to plain take() when the span is unbounded (spread matrices —
the adversarial case for any blocked format).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

DEFAULT_TC = 2048          # indices per chunk
MAX_REASONABLE_SPAN = 8192  # beyond this, plain take() wins


@partial(jax.jit, static_argnames=("tc",))
def chunk_span(idx: jax.Array, tc: int = DEFAULT_TC) -> jax.Array:
    """Max index span over tc-sized chunks (device scalar)."""
    n = idx.shape[0]
    ncap = -(-n // tc) * tc
    pad = jnp.full((ncap - n,), idx[-1] if n else 0, idx.dtype)
    x = jnp.concatenate([idx, pad]).reshape(-1, tc)
    return jnp.max(jnp.max(x, axis=1) - jnp.min(x, axis=1) + 1)


def pick_span(span: int) -> int:
    """Bucket a measured span to a static power of two (or 0 = fallback)."""
    if span > MAX_REASONABLE_SPAN:
        return 0
    s = 128
    while s < span:
        s *= 2
    return s


@partial(jax.jit, static_argnames=("max_span", "tc"))
def span_gather(
    table: jax.Array, idx: jax.Array, max_span: int, tc: int = DEFAULT_TC
) -> jax.Array:
    """out[t] = table[idx[t]] for (n, k) table, via chunked one-hot matmul.

    Every tc-chunk of idx must span <= max_span rows (see chunk_span).
    """
    n, k = table.shape
    t = idx.shape[0]
    if max_span >= n:  # table small enough to one-hot against directly
        max_span = n
    # pad table so dynamic_slice never clamps into misalignment
    tbl = table
    if n < max_span:
        tbl = jnp.zeros((max_span, k), table.dtype).at[:n].set(table)
        n = max_span
    ncap = -(-t // tc) * tc
    if ncap != t:
        idx = jnp.concatenate(
            [idx, jnp.zeros((ncap - t,), idx.dtype)]
        )
    idxr = jnp.clip(idx, 0, n - 1).reshape(-1, tc)

    precision = (
        jax.lax.Precision.HIGHEST
        if table.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    span_iota = jnp.arange(max_span, dtype=jnp.int32)

    def step(_, ix):
        base = jnp.minimum(jnp.min(ix), n - max_span)
        sl = jax.lax.dynamic_slice(tbl, (base, 0), (max_span, k))
        local = (ix - base).astype(jnp.int32)
        oh = (local[:, None] == span_iota[None, :]).astype(table.dtype)
        out = jnp.dot(oh, sl, precision=precision,
                      preferred_element_type=table.dtype)
        return 0, out

    if idxr.shape[0] == 1:
        _, out = step(0, idxr[0])
        out = out[None]
    else:
        _, out = jax.lax.scan(step, 0, idxr)
    return out.reshape(ncap, k)[:t]


def gather_rows(
    table: jax.Array, idx: jax.Array, max_span: int | None, tc: int = DEFAULT_TC
) -> jax.Array:
    """span_gather when a bounded span is known, plain take() otherwise."""
    if max_span:
        return span_gather(table, idx, max_span, tc)
    return jnp.take(table, jnp.clip(idx, 0, table.shape[0] - 1), axis=0)
