"""Pallas windowed SpGEMM product kernel
(ops/pallas/spgemm_window_kernel.py): plan-window construction,
interpret-mode correctness vs the XLA paths and the scipy oracle,
sentinel handling in padded tiles, and fallback routing.

Reference parity: the kernel plays the role of the reference's staged
operand loads + tensor-core product loop
(ref: src/bmSparse_SPGEMM.cu:164-201,343-389)."""

import numpy as np
import pytest
import scipy.sparse as sp

import jax.numpy as jnp

from bmsparse_tpu import coo_to_bmsparse, set_config
from bmsparse_tpu.ops import spgemm as sg
from bmsparse_tpu.ops.pallas.spgemm_window_kernel import W_MAX, _SENT_REL
from bmsparse_tpu.utils.timing import PhaseTimer


@pytest.fixture(autouse=True)
def _restore_config():
    set_config(spgemm_winkernel="on")
    yield
    set_config(spgemm_winkernel="auto")


def _banded(n, diags, seed=0):
    rng = np.random.default_rng(seed)
    rows_l, cols_l = [], []
    for d in diags:
        r = np.arange(max(0, -d), min(n, n - d))
        rows_l.append(r)
        cols_l.append(r + d)
    rows = np.concatenate(rows_l)
    cols = np.concatenate(cols_l)
    order = np.lexsort((cols, rows))
    vals = rng.standard_normal(rows.shape[0]).astype(np.float32)
    return (rows[order].astype(np.int32), cols[order].astype(np.int32),
            vals[order])


def _pair(n, diags, seed=0):
    rows, cols, vals = _banded(n, diags, seed)
    a = coo_to_bmsparse(rows, cols, vals, (n, n), backend="host")
    sco = a.to_scipy().tocoo()
    bt = coo_to_bmsparse(
        sco.row.astype(np.int32), sco.col.astype(np.int32),
        sco.data.astype(np.float32), a.shape, transposed=True,
        backend="host",
    )
    return a, bt


def test_windowed_product_matches_oracle():
    """Banded A@A: every K-group must get a tile-window plan and the
    kernel (interpret mode on CPU) must match the fallback paths and
    scipy."""
    a, bt = _pair(4096, [0, 1, -1, 8, -8, 17])
    p = sg._plan_product(a, bt, None, None, PhaseTimer(False), False)
    assert all(w is not None for w in p.pwin), p.pwin
    # relative tables live in the kernel layout with in-window indices;
    # tiles always carry 8 chunk slots (sentinel-padded when the
    # window-tightness ladder packs fewer real chunks)
    from bmsparse_tpu.ops.pallas.spgemm_window_kernel import TILE_CHUNKS

    for (wa, wb, t, cap), ta in zip(p.pwin, p.tas):
        assert ta.ndim == 4 and ta.shape[2] == TILE_CHUNKS
        tn = np.asarray(ta)
        real = tn != _SENT_REL
        assert tn[real].min() >= 0 and tn[real].max() < wa

    ref = (a.to_scipy() @ a.to_scipy()).tocsr()
    got = sp.csr_matrix(sg.spgemm(a, bt).to_scipy())
    d = abs(got - ref)
    assert got.nnz == ref.nnz
    assert (d.max() if d.nnz else 0.0) < 1e-4 * max(abs(ref).max(), 1)

    set_config(spgemm_winkernel="off")
    p2 = sg._plan_product(a, bt, None, None, PhaseTimer(False), False)
    assert all(w is None for w in p2.pwin)
    got2 = sp.csr_matrix(sg.spgemm(a, bt).to_scipy())
    # accumulation order differs between the kernel and the fallback
    np.testing.assert_allclose(
        got.toarray(), got2.toarray(), rtol=1e-5, atol=1e-5)


def test_windowed_product_scattered_falls_back():
    """Uniform random structure: tile spans exceed W_MAX, the plan must
    refuse windows, and the product stays correct."""
    n = 8192
    rng = np.random.default_rng(3)
    nnz = n * 2
    flat = rng.choice(n * n, size=nnz, replace=False)
    r, c = np.divmod(flat, n)
    order = np.lexsort((c, r))
    vals = rng.standard_normal(nnz).astype(np.float32)
    a = coo_to_bmsparse(
        r[order].astype(np.int32), c[order].astype(np.int32),
        vals[order], (n, n), backend="host",
    )
    sco = a.to_scipy().tocoo()
    bt = coo_to_bmsparse(
        sco.row.astype(np.int32), sco.col.astype(np.int32),
        sco.data.astype(np.float32), a.shape, transposed=True,
        backend="host",
    )
    p = sg._plan_product(a, bt, None, None, PhaseTimer(False), False)
    # blocks-per-chunk spans blow past W_MAX for the dominant groups on
    # a big-enough uniform matrix (nb ~ nnz >> W_MAX)
    assert int(a.nb) > 2 * W_MAX
    assert any(w is None for w in p.pwin)
    ref = (a.to_scipy() @ a.to_scipy()).tocsr()
    got = sp.csr_matrix(sg.spgemm(a, bt).to_scipy())
    d = abs(got - ref)
    assert (d.max() if d.nnz else 0.0) < 1e-4 * max(abs(ref).max(), 1)


def test_windowed_product_bf16():
    """bf16 operand tiles run through the windowed kernel with f32
    accumulation (the reference's half-in/float-out regime)."""
    a, bt = _pair(2048, [0, 2, -3, 9], seed=7)
    a16 = a.astype(jnp.bfloat16)
    bt16 = bt.astype(jnp.bfloat16)
    p = sg._plan_product(a16, bt16, None, None, PhaseTimer(False), False)
    assert any(w is not None for w in p.pwin)
    ref = (a.to_scipy() @ a.to_scipy()).tocsr()
    got = sp.csr_matrix(sg.spgemm(a16, bt16).to_scipy())
    d = abs(got - ref)
    assert (d.max() if d.nnz else 0.0) < 0.05 * max(abs(ref).max(), 1)


def test_windowed_product_f64_disabled():
    """f64 products keep the XLA paths (no TPU f64 vector unit) and
    stay correct."""
    import jax

    if not jax.config.read("jax_enable_x64"):
        pytest.skip("x64 disabled (f64 arrays truncate to f32, which "
                    "correctly keeps windows on)")
    a, bt = _pair(1024, [0, 1, -1], seed=5)
    a64 = a.astype(jnp.float64)
    bt64 = bt.astype(jnp.float64)
    p = sg._plan_product(a64, bt64, None, None, PhaseTimer(False), False)
    assert all(w is None for w in p.pwin)
    ref = (a.to_scipy().astype(np.float64)
           @ a.to_scipy().astype(np.float64)).tocsr()
    got = sp.csr_matrix(sg.spgemm(a64, bt64).to_scipy())
    d = abs(got - ref)
    assert (d.max() if d.nnz else 0.0) < 1e-10 * max(abs(ref).max(), 1)


def test_window_kernel_t_ladder_direct():
    """t_real < 8 (the window-tightness ladder): tiles carry sentinel
    slots 4..8 and the wrapper drops them; direct kernel check against
    a numpy block-product reference."""
    from bmsparse_tpu.ops.pallas.spgemm_window_kernel import (
        TILE_CHUNKS, numeric_window_pallas, pad_table,
    )

    rng = np.random.default_rng(21)
    nb = 300
    kg, t_real, ntiles = 2, 4, 2
    cap = ntiles * t_real
    a_flat = rng.standard_normal((nb, 64)).astype(np.float32)
    b_flat = rng.standard_normal((nb, 64)).astype(np.float32)
    # absolute slot tables, clustered per tile so windows fit
    ta_abs = np.full((ntiles, kg, TILE_CHUNKS, 128), nb, np.int64)
    tb_abs = np.full((ntiles, kg, TILE_CHUNKS, 128), nb, np.int64)
    ws = np.array([0, 40], np.int32)
    for i in range(ntiles):
        ta_abs[i, :, :t_real] = rng.integers(
            ws[i], ws[i] + 200, size=(kg, t_real, 128))
        tb_abs[i, :, :t_real] = rng.integers(
            ws[i], ws[i] + 200, size=(kg, t_real, 128))
    wa = wb = 256
    ra = np.where(ta_abs >= nb, 1 << 24,
                  ta_abs - ws[:, None, None, None]).astype(np.int32)
    rb = np.where(tb_abs >= nb, 1 << 24,
                  tb_abs - ws[:, None, None, None]).astype(np.int32)
    a_t = jnp.concatenate(
        [jnp.asarray(a_flat).T, jnp.zeros((64, 1), jnp.float32)], axis=1)
    b_t = jnp.concatenate(
        [jnp.asarray(b_flat).T, jnp.zeros((64, 1), jnp.float32)], axis=1)
    out = np.asarray(numeric_window_pallas(
        pad_table(a_t, 512), pad_table(b_t, 512),
        jnp.asarray(ra), jnp.asarray(rb),
        jnp.asarray(ws), jnp.asarray(ws), kg, wa, wb, t_real=t_real,
    ))
    assert out.shape == (cap * 128, 64)
    # numpy reference: per slot, C[i,m] = sum_k sum_j A[i*8+j]*B[j*8+m]
    ae = np.concatenate([a_flat, np.zeros((1, 64), np.float32)])
    be = np.concatenate([b_flat, np.zeros((1, 64), np.float32)])
    for tile in range(ntiles):
        for c in range(t_real):
            for lane in (0, 7, 127):
                acc = np.zeros((8, 8), np.float32)
                for k in range(kg):
                    av = ae[min(ta_abs[tile, k, c, lane], nb)].reshape(
                        8, 8)
                    bv = be[min(tb_abs[tile, k, c, lane], nb)].reshape(
                        8, 8)
                    acc += av @ bv  # B slots [j*8+m]: bv axes are (j, m)
                row = (tile * t_real + c) * 128 + lane
                np.testing.assert_allclose(
                    out[row].reshape(8, 8), acc, rtol=1e-4, atol=1e-4)


def test_cached_product_uses_windows():
    """prepare_product caches the window plan; repeated multiplies with
    updated values stay correct through the kernel."""
    from bmsparse_tpu.ops.product import prepare_product

    a, bt = _pair(2048, [0, 1, -1, 5], seed=11)
    pp = prepare_product(a, bt)
    assert any(w is not None for w in pp.plan.pwin)
    ref = (a.to_scipy() @ a.to_scipy()).tocsr()
    got = sp.csr_matrix(pp().to_scipy())
    d = abs(got - ref)
    assert (d.max() if d.nnz else 0.0) < 1e-4 * max(abs(ref).max(), 1)
