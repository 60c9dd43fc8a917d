"""Multi-chip scaling report — the SURVEY.md §7.6 deliverable.

Runs the tiered sharded SpMV over increasing mesh sizes and reports
per-mesh timing plus scaling efficiency (t_1 / (d * t_d)) and the shard
work balance. On a real TPU pod the timings are ICI-overlapped
measurements; on the CPU simulator (XLA_FLAGS=
--xla_force_host_platform_device_count=N JAX_PLATFORMS=cpu) the run
validates the sharded compilation/execution and reports balance only.

Usage:
  python -m bmsparse_tpu.cli.scaling matrices_dir A_name [--devices 1,2,4,8]
  python -m bmsparse_tpu.cli.scaling --synthetic band --n 262144
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="bmsparse-scaling")
    p.add_argument("folder", nargs="?", help="matrix directory")
    p.add_argument("a_name", nargs="?", help="matrix name (without .mtx)")
    p.add_argument("--synthetic", choices=["band", "stencil"], default=None)
    p.add_argument("--n", type=int, default=262144)
    p.add_argument("--devices", default=None,
                   help="comma-separated mesh sizes (default: 1..all)")
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--cpu-sim", action="store_true",
                   help="force the CPU backend (use with XLA_FLAGS="
                        "--xla_force_host_platform_device_count=N; needed "
                        "on images that pin jax_platforms)")
    args = p.parse_args(argv)

    import jax

    if args.cpu_sim:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from .. import coo_to_bmsparse, mmread_bmsparse
    from ..parallel.mesh import make_mesh
    from ..parallel.partition import partition
    from ..parallel.plan import prepare_sharded
    from ..parallel.spmv import sharded_spmv_prepared
    from ..utils.timing import time_op

    if args.synthetic:
        n = args.n
        rng = np.random.default_rng(0)
        if args.synthetic == "stencil":
            offs = np.arange(-8, 9)
        else:
            offs = rng.integers(-8, 9, size=16)
        rows = np.repeat(np.arange(n, dtype=np.int64), len(offs))
        cols = np.clip(rows + np.tile(offs, n), 0, n - 1)
        key = np.unique(rows * n + cols)
        rows, cols = np.divmod(key, n)
        vals = rng.standard_normal(len(rows)).astype(np.float32)
        m = coo_to_bmsparse(
            rows.astype(np.int32), cols.astype(np.int32), vals, (n, n),
            backend="host",
        )
    elif args.folder and args.a_name:
        import os

        m = mmread_bmsparse(os.path.join(args.folder, args.a_name))
    else:
        p.error("need folder+name or --synthetic")

    total = len(jax.devices())
    sizes = ([int(x) for x in args.devices.split(",")] if args.devices
             else [d for d in (1, 2, 4, 8, 16, 32) if d <= total])
    rng = np.random.default_rng(1)
    v = jnp.asarray(rng.standard_normal(m.num_cols).astype(np.float32))

    print(f"matrix {m.shape}, nnz {m.nnz}; devices available: {total}")
    t1 = None
    for d in sizes:
        mesh = make_mesh(d)
        sm = partition(m, d, align=16)
        sp = prepare_sharded(sm)
        nbs = np.asarray(sm.nb)
        balance = float(nbs.max() / max(nbs.mean(), 1e-9))
        t, _ = time_op(
            lambda: sharded_spmv_prepared(sp, v, mesh),
            iters=max(args.iters, 1),
        )
        if t1 is None:
            t1 = t * d  # single-shard-equivalent time
        eff = t1 / (d * t) if t > 0 else float("nan")
        print(f"  d={d:3d}: {t*1e6:10.1f} us/iter  "
              f"scaling efficiency {eff*100:6.1f}%  "
              f"shard imbalance (max/mean blocks) {balance:.2f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
