"""Sparse matrix-vector multiply u = A @ v on BmSparse.

TPU-native restatement of the reference SpMV
(ref: src/bmSparse_SPMV.cu:72-230). The reference launches one CUDA block
per 8-row strip, stages each 8x8 block into shared memory via
prefix-popcount decompression, does 64 FMAs and a shuffle tree-reduction
(`spmv_kernel` :153-189; the "batched" `spmv_kernel_new` :84-150 processes
4 blocks per iteration). On TPU the same computation is expressed as:

  decompress blocks -> (nb, 8, 8) dense tiles     (VPU-friendly, fused)
  gather v segments -> (nb, 8)
  per-block matvec + segment-sum over block rows  (XLA fuses the chain)

Implementations:
  * "xla"    — the fused jnp formulation below (single compiled program).
  * "pallas" — hand-scheduled kernel in ops/pallas/spmv_kernel.py that
               streams packed values and fuses decompress+FMA+reduce.

The reference's host-side `first_blocks` row index (exclusive scan of
per-block-row counts, ref: :196-206) is unnecessary here: segment_sum over
`brow` performs the same reduction without materializing the index. Note
the reference sizes its grid with num_cols where num_rows is meant
(ref: :217,220 — correct only for square matrices); we implement the
intended semantics with explicit shapes.

Padding blocks (bmp == 0) contribute exact zeros, so both implementations
are safe on padded containers — this is what makes the op shard_map-able.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..config import BLOCK_HEIGHT, BLOCK_WIDTH, get_config
from ..format.bmsparse import BmSparse, cdiv


@jax.jit
def _spmv_xla(m: BmSparse, v: jax.Array) -> jax.Array:
    nbr = m.block_rows
    # Pad (or trim) v to whole blocks so per-block gathers are in-bounds;
    # the multi-chip path passes an all-gathered v that may be longer.
    n = m.block_cols * BLOCK_WIDTH
    if v.shape[0] >= n:
        vpad = v[:n]
    else:
        vpad = jnp.zeros((n,), v.dtype).at[: v.shape[0]].set(v)

    dense = m.decompress_blocks()                           # (nb, 8, 8)
    vseg = vpad[m.bcol[:, None] * BLOCK_WIDTH
                + jnp.arange(BLOCK_WIDTH)[None, :]]         # (nb, 8)
    acc_dtype = jnp.promote_types(m.dtype, jnp.float32)
    # f32 data must not be decomposed into bf16 MXU passes (oracle parity);
    # bf16 data uses the native multiply path with f32 accumulation.
    precision = (
        jax.lax.Precision.HIGHEST
        if dense.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    contrib = jnp.einsum(
        "nij,nj->ni",
        dense.astype(acc_dtype) if dense.dtype != jnp.bfloat16 else dense,
        vseg.astype(acc_dtype) if vseg.dtype != jnp.bfloat16 else vseg,
        preferred_element_type=acc_dtype,
        precision=precision,
    )                                                       # (nb, 8)
    # Padding blocks have brow == nbr (sentinel) -> dropped by num_segments.
    u_blocks = jax.ops.segment_sum(contrib, m.brow, num_segments=nbr)
    return u_blocks.reshape(nbr * BLOCK_HEIGHT)[: m.num_rows].astype(v.dtype)


def spmv(m: BmSparse, v: jax.Array, impl: str | None = None) -> jax.Array:
    """u = A @ v.

    Args:
      m: BmSparse matrix (untransposed intra-block layout).
      v: dense vector of length m.num_cols.
      impl: "xla" | "pallas" | None (config default / auto).
    """
    if m.transposed:
        raise ValueError("SpMV expects an untransposed (row-major) matrix")
    if v.shape[0] != m.num_cols:
        raise ValueError(f"v has length {v.shape[0]}, expected {m.num_cols}")
    impl = impl or get_config().spmv_impl
    if impl in ("auto", "xla"):
        return _spmv_xla(m, v)
    if impl == "pallas":
        from .pallas.spmv_kernel import spmv_pallas

        return spmv_pallas(m, v)
    raise ValueError(f"unknown SpMV impl {impl!r}")


# ---------------------------------------------------------------------------
# CSR reference SpMV — BASELINE config 1 ("CSR SpMV ... CPU reference path").
# ---------------------------------------------------------------------------
@jax.jit
def csr_spmv(a, v: jax.Array) -> jax.Array:
    """u = A @ v for a CSRMatrix, as a gather + segment-sum."""
    contrib = a.data * jnp.take(v, a.indices, axis=0)
    return jax.ops.segment_sum(contrib, a.row_ids(), num_segments=a.num_rows)
