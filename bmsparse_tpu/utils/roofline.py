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
    from HBM once. Vectors and structure metadata are NOT charged: v/u
    can legitimately stay VMEM-resident across iterative-solver calls,
    and an ideal plan (the DIA tier) encodes structure statically —
    charging either lets implementations exceed 100% of "roofline"."""
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
