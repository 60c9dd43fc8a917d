"""Pallas windowed SELL SpMV kernel (ops/pallas/sell_kernel.py): plan
window construction, interpret-mode kernel correctness vs the XLA path
and the scipy oracle, fallback routing for unwindowable structure.

Reference parity: the windowed kernel plays the role of the reference's
single gather SpMV kernel for off-diagonal structure
(ref: src/bmSparse_SPMV.cu:84-150)."""

import numpy as np
import pytest
import scipy.sparse as sp

import jax.numpy as jnp

from bmsparse_tpu import coo_to_bmsparse, spmv
from bmsparse_tpu.ops.pallas.sell_kernel import (
    WINDOW_UNITS, k_slice, ncu_padded,
)
from bmsparse_tpu.ops.plan import prepare


def _clustered_coo(n, deg, spread, seed):
    """Road-like rows: each row's columns cluster near a random center."""
    rng = np.random.default_rng(seed)
    rows = np.repeat(np.arange(n, dtype=np.int64), deg)
    centers = rng.integers(0, n, size=n)
    cols = np.clip(
        centers[rows] + rng.integers(0, spread, size=rows.shape[0]),
        0, n - 1,
    )
    key = np.unique(rows * n + cols)
    rows, cols = np.divmod(key, n)
    vals = rng.standard_normal(rows.shape[0]).astype(np.float32)
    return rows.astype(np.int32), cols.astype(np.int32), vals


def test_windowed_sell_matches_oracle():
    """Clustered structure: every K-group must get a window plan, and the
    Pallas path (interpret mode on CPU) must match XLA and the oracle."""
    n = 4096
    rows, cols, vals = _clustered_coo(n, deg=6, spread=48, seed=31)
    m = coo_to_bmsparse(rows, cols, vals, (n, n), backend="host")
    p = prepare(m)
    assert p.sell_rel and all(r is not None for r in p.sell_rel), (
        "clustered structure must produce per-chunk v windows"
    )
    # the kernel's VMEM guard must engage k-slicing on at least one deep
    # group here (cw=64 super-slots at kg >= 12 exceed one slice)
    cw = p.sell_dense[0].shape[0]
    assert any(k_slice(cw, kg) < kg for kg in p.sell_ks) or cw == 8

    rng = np.random.default_rng(7)
    v = rng.standard_normal(n).astype(np.float32)
    ref = m.to_scipy() @ v
    u_xla = np.asarray(spmv(p, jnp.asarray(v), impl="xla"))
    u_pl = np.asarray(spmv(p, jnp.asarray(v), impl="pallas"))
    np.testing.assert_allclose(u_xla, ref, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(u_pl, ref, rtol=1e-4, atol=1e-5)


def test_windowed_plan_invariants():
    """Every real slot of a windowed group must land inside its chunk's
    [ws, ws + W) window of the padded v table."""
    n = 4096
    rows, cols, vals = _clustered_coo(n, deg=5, spread=90, seed=13)
    m = coo_to_bmsparse(rows, cols, vals, (n, n), backend="host")
    p = prepare(m)
    assert any(r is not None for r in p.sell_rel)
    for dense_g, bcol_g, ws, rel, kg in zip(
        p.sell_dense, p.sell_bcol, p.sell_ws, p.sell_rel, p.sell_ks
    ):
        if rel is None:
            continue
        cw, cap = dense_g.shape[0], dense_g.shape[1]
        ncu = bcol_g.max()          # padding sentinel = ncu
        bc = np.asarray(bcol_g).reshape(cap, kg, 128)
        rel_np = np.asarray(rel)
        ws_np = np.asarray(ws)
        real = bc != int(ncu)
        assert rel_np.min() >= 0 and rel_np.max() < WINDOW_UNITS
        # window starts stay DMA-in-bounds on the padded table
        ncu_pad = ncu_padded(int(ncu))
        assert ws_np.min() >= 0
        assert ws_np.max() <= ncu_pad - WINDOW_UNITS
        # rel reconstructs the absolute block column for real slots
        np.testing.assert_array_equal(
            (rel_np + ws_np[:, None, None])[real], bc[real]
        )
        assert (rel_np[~real] == 0).all()


def test_scattered_falls_back_to_xla_gather():
    """Uniform random structure can't fit per-chunk windows; the plan
    must not emit any, and impl='pallas' must still be correct via the
    XLA gather fallback."""
    n = 4096
    rng = np.random.default_rng(3)
    nnz = n * 4
    flat = rng.choice(n * n, size=nnz, replace=False)
    r, c = np.divmod(flat, n)
    order = np.lexsort((c, r))
    vals = rng.standard_normal(nnz).astype(np.float32)
    m = coo_to_bmsparse(
        r[order].astype(np.int32), c[order].astype(np.int32),
        vals[order], (n, n), backend="host",
    )
    p = prepare(m)
    assert all(rel is None for rel in p.sell_rel)
    v = rng.standard_normal(n).astype(np.float32)
    u = np.asarray(spmv(p, jnp.asarray(v), impl="pallas"))
    np.testing.assert_allclose(
        u, m.to_scipy() @ v, rtol=1e-4, atol=1e-5
    )


def test_windowed_tiny_matrix():
    """ncu < WINDOW_UNITS: one window covers the whole v table."""
    r = np.array([0, 1, 5, 9], np.int32)
    c = np.array([3, 9, 1, 14], np.int32)
    vals = np.arange(1, 5, dtype=np.float32)
    m = coo_to_bmsparse(r, c, vals, (16, 16), backend="host")
    p = prepare(m)
    assert p.sell_rel and p.sell_rel[0] is not None
    v = np.arange(16, dtype=np.float32)
    u = np.asarray(spmv(p, jnp.asarray(v), impl="pallas"))
    ref = sp.csr_matrix((vals, (r, c)), shape=(16, 16)) @ v
    np.testing.assert_allclose(u, ref, rtol=1e-6)


def test_bf16_windows_engage():
    """bf16 plans window their multi-K groups (dense tiles stream at
    half the bytes and cast to f32 in-kernel); single-K bf16 groups
    stay on the XLA gather (their (8, 128) bf16 face is below the
    packed-sublane tile). Correct either way under impl='pallas'."""
    n = 1024
    rows, cols, vals = _clustered_coo(n, deg=4, spread=30, seed=5)
    m = coo_to_bmsparse(rows, cols, vals, (n, n), backend="host")
    p = prepare(m, dtype=jnp.bfloat16)
    assert any(
        rel is not None for rel, kg in zip(p.sell_rel, p.sell_ks)
        if kg >= 2
    )
    assert all(
        rel is None for rel, kg in zip(p.sell_rel, p.sell_ks) if kg < 2
    )
    v = np.ones(n, np.float32)
    u = np.asarray(
        spmv(p, jnp.asarray(v, jnp.bfloat16), impl="pallas")
    ).astype(np.float32)
    ref = sp.csr_matrix(
        (vals, (rows, cols)), shape=(n, n)
    ) @ v
    np.testing.assert_allclose(u, ref, rtol=0.05, atol=0.1)


def test_f64_plan_skips_windows():
    """f64 plans keep the XLA path (no TPU f64 vector unit) and stay
    correct under impl='pallas'."""
    n = 512
    rows, cols, vals = _clustered_coo(n, deg=4, spread=20, seed=9)
    m = coo_to_bmsparse(
        rows, cols, vals.astype(np.float64), (n, n), backend="host")
    p = prepare(m, dtype=jnp.float64)
    assert all(rel is None for rel in p.sell_rel)
    import jax
    if not jax.config.read("jax_enable_x64"):
        pytest.skip("x64 disabled (values truncate to f32)")
    v = np.ones(n, np.float64)
    u = np.asarray(spmv(p, jnp.asarray(v), impl="pallas"))
    ref = sp.csr_matrix((vals, (rows, cols)), shape=(n, n)) @ v
    np.testing.assert_allclose(u, ref, rtol=1e-6)


def _road_like_coo(n, seed):
    """Locally clustered rows plus ~1% far 'highway' links — the round-3
    structure on which windows never engaged (VERDICT r3 #2)."""
    rng = np.random.default_rng(seed)
    rows = np.repeat(np.arange(n, dtype=np.int64), 4)
    cols = np.clip(rows + rng.integers(-40, 41, size=rows.shape[0]), 0, n - 1)
    nh = n // 100
    hs = rng.integers(0, n, nh)
    hd = rng.integers(0, n, nh)
    rows = np.concatenate([rows, hs])
    cols = np.concatenate([cols, hd])
    key = np.unique(rows * n + cols)
    rows, cols = np.divmod(key, n)
    vals = rng.standard_normal(rows.shape[0]).astype(np.float32)
    return rows.astype(np.int32), cols.astype(np.int32), vals


def test_outlier_split_engages_windows():
    """Rows with a few far links must shed them into the overflow tier so
    the core chunks still fit windows; the result stays exact."""
    n = 32768
    rows, cols, vals = _road_like_coo(n, seed=11)
    m = coo_to_bmsparse(rows, cols, vals, (n, n), backend="host")
    p = prepare(m)
    # the far links went to the overflow mini-SELL ...
    assert p.ovf_ks, "expected overflow slots on a road-like structure"
    assert p.ovf_rows > 0 and p.ovf_gather is not None
    # ... so the core tier gets window plans on most of its groups
    nwin = sum(r is not None for r in p.sell_rel)
    assert nwin >= 1, f"no windowed groups: ks={p.sell_ks}"
    wslots = sum(
        int(np.prod(d.shape[1:3])) * 128
        for d, r in zip(p.sell_dense, p.sell_rel) if r is not None
    )
    tslots = sum(int(np.prod(d.shape[1:3])) * 128 for d in p.sell_dense)
    assert wslots >= 0.8 * tslots, (
        f"windowed slot share too low: {wslots}/{tslots}"
    )

    rng = np.random.default_rng(5)
    v = rng.standard_normal(n).astype(np.float32)
    ref = m.to_scipy() @ v
    u_xla = np.asarray(spmv(p, jnp.asarray(v), impl="xla"))
    u_pl = np.asarray(spmv(p, jnp.asarray(v), impl="pallas"))
    np.testing.assert_allclose(u_xla, ref, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(u_pl, ref, rtol=1e-4, atol=1e-5)


def test_per_chunk_eligibility_splits_groups():
    """Unit test of the builder: a K class whose chunks are part tight,
    part scattered must split into a windowed group and a gather group
    (same K) instead of disabling windows for the whole class (the
    round-3 all-or-nothing behavior, VERDICT r3 #2)."""
    from bmsparse_tpu.ops.plan import _build_sell_tier

    nbr, ncu, cw = 256, 4096, 8
    rng = np.random.default_rng(0)
    # two slots per block row: rows 0..127 inside a 96-unit window,
    # rows 128..255 spread over >=2048 units -> same K class (k=2),
    # the tight chunk window-eligible, the scattered one not
    i = np.arange(nbr, dtype=np.int64)
    lo = np.where(i < 128, i % 64, 2048 + (37 * i) % 1024)
    hi = np.where(i < 128, i % 64 + 32, 3072 + (53 * i) % 1024)
    ubr = np.repeat(i, 2)
    ubc = np.stack([lo, hi], axis=1).reshape(-1)
    key = np.unique(ubr * ncu + ubc)
    ubr, ubc = np.divmod(key, ncu)
    binv = np.arange(len(ubr))          # one scalar per super-slot
    slot = np.zeros(len(ubr), np.int64)
    vals = rng.standard_normal(len(ubr)).astype(np.float32)
    dense, bcol, ks, ws, rel, og, rows_total = _build_sell_tier(
        np.arange(len(ubr)), ubr, ubc, slot, vals, binv,
        nbr, ncu, cw, np.dtype(np.float32),
        adaptive=True, secondary_wlo=True, win_ok=True, elig_split=True,
    )
    k2 = [g for g, k in enumerate(ks) if k == 2]
    assert len(k2) == 2, f"expected the k=2 class split in two, ks={ks}"
    flags = sorted(rel[g] is not None for g in k2)
    assert flags == [False, True], (
        "expected one windowed and one gather group in the k=2 class"
    )
