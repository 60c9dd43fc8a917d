"""Shared --platform flag for the CLI drivers.

This image pins jax_platforms (so the JAX_PLATFORMS env var is
ignored); the only reliable way to force a backend is
jax.config.update before the first backend initialization. Used by
cli/spmv.py, cli/spgemm.py, and cli/scaling.py.
"""

from __future__ import annotations

import argparse


def add_platform_arg(p: argparse.ArgumentParser) -> None:
    p.add_argument(
        "--platform", default=None, choices=["cpu", "tpu"],
        help="force the jax backend (this image pins jax_platforms, so "
             "the JAX_PLATFORMS env var is ignored; use --platform cpu "
             "when the TPU tunnel is unavailable)")


def apply_platform(args: argparse.Namespace) -> None:
    """Must run before any jax computation initializes a backend."""
    if getattr(args, "platform", None):
        import jax

        jax.config.update("jax_platforms", args.platform)
    enable_compile_cache()


def enable_compile_cache() -> None:
    """Point jax at a persistent compilation cache (compiles over the
    tunneled TPU runtime cost 40-90 s per shape; batch sweeps re-visit
    the same shapes constantly). Opt out with BMSP_NO_COMPILE_CACHE=1;
    relocate with BMSP_COMPILE_CACHE=<dir>."""
    import os

    if os.environ.get("BMSP_NO_COMPILE_CACHE"):
        return
    try:
        import jax

        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get(
                "BMSP_COMPILE_CACHE",
                os.path.expanduser("~/.cache/bmsparse_jax"),
            ),
        )
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - older jax without the knobs
        pass
