"""Reliable wall-clock timing for jitted functions on remote/async backends.

Some PJRT plugins (the tunneled TPU used here) complete `block_until_ready`
without waiting for device execution: every dispatch is fire-and-forget and
only a device->host transfer forces completion.  Measured times without a
fetch are pure dispatch overhead (~30 us) regardless of the kernel
(tools/kernel_report.py r1 fell into this trap).

`synced_ms` dispatches `iters` calls and then fetches one tiny reduction of
the last output; single-device PJRT execution is in-order, so the fetch
drains the whole queue.  The reduction is jitted once per output structure.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def _tiny(leaf):
    # abs() first so complex leaves reduce through float before any cast
    # (complex64 must never cross the device boundary on this backend)
    return jnp.sum(jnp.abs(leaf).astype(jnp.float32) * 1e-9).reshape(1)


def _first_leaf(y):
    """Prefer a non-complex device leaf (complex can't leave the device)."""
    from . import cplx
    leaves = [x for x in jax.tree_util.tree_leaves(y)
              if not isinstance(x, cplx.CF)]
    noncplx = [x for x in leaves
               if not np.issubdtype(getattr(x, "dtype", np.float32),
                                    np.complexfloating)]
    return (noncplx or leaves)[0]


def fetch(y) -> float:
    """Force completion of everything dispatched before (and including) y.

    Transient UNIMPLEMENTED transfer errors from the tunnel are retried.
    """
    leaf = _first_leaf(y)
    if isinstance(leaf, np.ndarray) or np.isscalar(leaf):
        # already host memory: the producing transfer has drained the queue
        return float(np.sum(np.abs(np.asarray(leaf))) * 1e-9)
    for attempt in range(3):
        try:
            return float(np.asarray(_tiny(leaf))[0])
        except Exception:
            if attempt == 2:
                raise
            time.sleep(2.0 * (attempt + 1))


def synced_ms(f, args=(), iters: int = 10, warmup: int = 2) -> float:
    """Mean wall-clock ms per call of f(*args), fetch-synced.

    CAVEAT (measured, tools/probe_floor.py r05): the closing fetch costs one
    tunnel round trip (~27 ms), which this mean amortizes over `iters` —
    at iters=10 that is a +2.7 ms constant on every result. Use
    `synced_ms_marginal` when the per-call figure must exclude it (the r04
    kernel report's "~4 ms floor" was mostly this artifact: 27/iters ms of
    fetch plus ~0.2-0.9 ms of real per-program dispatch).
    """
    for _ in range(max(1, warmup)):
        y = f(*args)
    fetch(y)
    t0 = time.perf_counter()
    for _ in range(iters):
        y = f(*args)
    fetch(y)
    return (time.perf_counter() - t0) / iters * 1e3


def synced_ms_marginal(f, args=(), iters: int = 10, warmup: int = 2) -> float:
    """Marginal wall-clock ms per call, fetch-RTT-free.

    Times `iters` and `3*iters` back-to-back dispatches (each run closed by
    ONE fetch) and differences the two: the constant per-run term (the
    ~27 ms tunnel fetch RTT plus any fixed sync cost) cancels, leaving the
    true pipelined per-call cost max(dispatch ~0.2-0.9 ms, device compute).
    This is the honest per-kernel number on a backend where only a
    device->host transfer drains the queue.
    """
    for _ in range(max(1, warmup)):
        y = f(*args)
    fetch(y)

    def run(n):
        t0 = time.perf_counter()
        for _ in range(n):
            y = f(*args)
        fetch(y)
        return time.perf_counter() - t0

    t_a, t_b = run(iters), run(3 * iters)
    return max(t_b - t_a, 1e-9) / (2 * iters) * 1e3
