"""Row-gather helpers for the numeric phases.

XLA lowers `jnp.take(table, idx, axis=0)` on TPU to a per-index row fetch
(~0.3-1 Grow/s measured on v5e for 4-64-wide rows — cost scales with the
index count, not the byte count, so wide-row gathers are the efficient
dynamic access). The CUDA reference leans on per-element shared-memory
gathers (ref: src/bmSparse_SPGEMM.cu:152-162); the TPU design instead
widens every dynamic access to row granularity and moves all other
addressing into plan-time layouts (ops/plan.py, ops/spgemm.py
_plan_sell_device).

A round-1 experiment replaced bounded-span gathers with one-hot matmuls
on the MXU (`span_gather`): measured end-to-end it LOST to plain take()
— the one-hot construction and the (span x width) matmul traffic exceed
the per-index cost unless the span is tiny, and tiny-span index streams
are exactly where XLA's gather is already fast. The machinery was
removed; this module keeps the single honest primitive.
"""

from __future__ import annotations

import jax.numpy as jnp


def gather_rows(table, idx):
    """out[t] = table[idx[t]] with out-of-range indices clamped."""
    return jnp.take(table, jnp.clip(idx, 0, table.shape[0] - 1), axis=0)
