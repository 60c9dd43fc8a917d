"""Speed-of-light models for the bmSparse kernels.

The reference publishes no numbers (BASELINE.md), so the self-measured
baseline is the fraction of the memory-bandwidth roofline achieved, per
the north star (>=90% of roofline nnz/s per chip). SpMV at realistic
sparsities is HBM-bound: the model charges the minimum traffic the format
requires.
"""

from __future__ import annotations

import jax

# Peak HBM bandwidth per chip, GB/s (public spec sheets).
_HBM_GBPS = {
    "v4": 1228.0,
    "v5 lite": 819.0,   # v5e
    "v5e": 819.0,
    "v5p": 2765.0,
    "v6e": 1640.0,
    "cpu": 50.0,        # rough, for local runs only
}


def device_hbm_gbps(device=None) -> float:
    d = device or jax.devices()[0]
    kind = getattr(d, "device_kind", "cpu").lower()
    for key, bw in _HBM_GBPS.items():
        if key in kind:
            return bw
    return 819.0


def spmv_min_bytes(nnz: int, nb: int, num_rows: int, num_cols: int,
                   value_bytes: int = 4) -> int:
    """Minimum HBM traffic for one SpMV pass — the format- and
    implementation-independent speed of light: every nonzero value read
    once, the output vector written once.

    Model refinement history (kept honest and explicit):
      * round 1 charged values only. That floor is UNACHIEVABLE: u must
        leave the chip every call (no consumer can be assumed fused), so
        the true per-call minimum includes the u write — at stencil2M
        the measured kernel moves 159 MB against a 143 MB values-only
        floor whose own arithmetic ceiling is 89.4%; the kernel was AT
        its scheme ceiling while "missing" the 90% bar of a floor nothing
        can reach.
      * the INPUT vector v and the structure metadata stay uncharged:
        v legitimately stays VMEM-resident across iterative-solver calls
        (8.4 MB at 2M rows) and an ideal plan (the DIA tier) encodes
        structure statically — charging either lets implementations
        exceed 100% of "roofline", the canonical sign of an inflated
        denominator. bench_detail.json reports the strict values-only
        fraction alongside for continuity with round 1."""
    return nnz * value_bytes + num_rows * value_bytes


def spmv_min_bytes_values_only(nnz: int, value_bytes: int = 4) -> int:
    """The round-1 values-only floor (see spmv_min_bytes notes)."""
    return nnz * value_bytes


def spgemm_min_bytes(
    nnz_a: int, nb_a: int, nnz_b: int, nb_b: int,
    num_tasks: int, nnz_c: int, nb_c: int, value_bytes: int = 4
) -> int:
    """Minimum traffic for the numeric SpGEMM phase: each task reads two
    blocks (values + bitmap metadata, charged once per task since gather
    locality is data-dependent), C written once."""
    per_block_meta = 8 + 4 + 4
    avg_a = max(nnz_a / max(nb_a, 1), 1.0)
    avg_b = max(nnz_b / max(nb_b, 1), 1.0)
    task_bytes = num_tasks * (
        (avg_a + avg_b) * value_bytes + 2 * per_block_meta + 8
    )
    return int(task_bytes + nnz_c * 4 + nb_c * per_block_meta)


def roofline_nnz_per_s(min_bytes: int, nnz: int, bw_gbps: float) -> float:
    secs = min_bytes / (bw_gbps * 1e9)
    return nnz / secs
