"""Micro-benchmark harness for TPU ops behind the axon tunnel.

The tunnel acks dispatches before execution completes and memoizes
repeated identical dispatches, so naive block_until_ready timing reads
as fast as the round-trip latency (~25 us) regardless of the real cost.
The only trustworthy method found: run the op N times *inside one jit*
via fori_loop, read back a dependent 4-byte scalar, and report the
(N_hi - 1)-normalized slope between N=1 and N=N_hi runs.

Usage:
    from tools.ubench import slope
    dt = slope(lambda x: my_op(x), x0)          # seconds per op
"""

from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp


def _scalarize(tree):
    leaf = jax.tree_util.tree_leaves(tree)[0]
    return jnp.sum(leaf.reshape(-1)[:1].astype(jnp.float32))


def slope(op, x0, n_hi: int = 16, reps: int = 2) -> float:
    """Seconds per single application of op (state-chained inside jit)."""

    def make(n):
        def run(x):
            return jax.lax.fori_loop(0, n, lambda i, v: op(v), x)

        return jax.jit(run)

    times = {}
    for n in (1, n_hi):
        f = make(n)
        float(_scalarize(f(x0)))  # compile + warm
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(_scalarize(f(x0)))
            best = min(best, time.perf_counter() - t0)
        times[n] = best
    return max(0.0, (times[n_hi] - times[1]) / (n_hi - 1))


def slope_multi(op, args, n_hi: int = 8, reps: int = 2) -> float:
    """Like slope, for ops whose state is a tuple pytree."""
    return slope(lambda t: op(*t) if isinstance(t, tuple) else op(t), args,
                 n_hi=n_hi, reps=reps)
