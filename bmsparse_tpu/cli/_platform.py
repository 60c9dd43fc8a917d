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
