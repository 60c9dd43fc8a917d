"""Robust on-device timing under the axon-tunneled TPU runtime.

Quirks this works around (measured, 2026-08):
  * jax.block_until_ready returns before remote execution completes, so
    naive per-call wall timing is meaningless;
  * the first device->host fetch in a process pays a multi-minute tunnel
    handshake;
  * every scalar fetch costs ~30 ms round trip.

Strategy: run `iters` data-dependent executions inside ONE jitted
fori_loop (single dispatch), synchronize with one scalar fetch, subtract
the measured fetch baseline, divide by iters.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp


_handshook = False


def ensure_handshake() -> float:
    """Pay the first-fetch handshake; return the steady scalar-fetch
    latency (seconds)."""
    global _handshook
    x = jnp.ones((8, 128), jnp.float32)
    float(jnp.sum(x))  # first fetch (slow once per process)
    _handshook = True
    ts = []
    for _ in range(5):
        y = jnp.sum(x) * (1.0 + len(ts) * 1e-6)
        t0 = time.perf_counter()
        float(y)
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def time_chain(step_fn, x0, iters: int = 30, reps: int = 3, args=()) -> float:
    """Median per-iteration seconds of `x = step_fn(x, *args)` chained in
    one dispatch. `step_fn` must be shape-preserving and keep a data
    dependence between iterations.

    Methodology: ONE jitted fori_loop with a *dynamic* trip count; the
    per-iteration time is (t(n_hi) - t(n_lo)) / (n_hi - n_lo), which
    cancels dispatch/tunnel round-trip latency exactly (measured 28-55 ms
    and drifting on the axon runtime — differencing is the only reliable
    scheme at sub-millisecond kernel times). The dynamic trip count also
    stops XLA from unrolling/specializing across iterations.

    Pass large arrays via `args` — NOT via closure: closed-over device
    arrays are serialized into the HLO as constants (the axon remote
    compiler rejects >~100MB programs with HTTP 413)."""
    ensure_handshake()

    def chained_fn(a, n, *rest):
        return jax.lax.fori_loop(
            0, n, lambda i, s: step_fn(s, *rest), a, unroll=False
        )

    chained = jax.jit(chained_fn)

    def run(n):
        t0 = time.perf_counter()
        r = chained(x0, jnp.int32(n), *args)
        float(jnp.sum(jnp.ravel(jax.tree_util.tree_leaves(r)[0])[:1]))
        return time.perf_counter() - t0

    run(1)  # compile + warm
    # Calibrate the trip count so the chain runs ~150 ms on device — the
    # RTT variance (several ms) must be negligible against the signal.
    est = max((run(64) - run(2)) / 62, 1e-7)
    n = int(min(max(0.15 / est, 64), 100_000))
    deltas = []
    for _ in range(reps):
        t_lo = run(2)
        t_hi = run(2 + n)
        deltas.append((t_hi - t_lo) / n)
    deltas.sort()
    return max(deltas[len(deltas) // 2], 1e-9)
