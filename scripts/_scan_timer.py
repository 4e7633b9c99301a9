"""Scan-chained per-iteration timer for small (ms-scale) device ops.

Why: chaining iterations at Python level (eager feedback ops between jit
dispatches) is fine for ~100 ms steps (bench.py, profile_step.py) but for
1-10 ms ops the per-dispatch tunnel latency jitter swamps the marginal
cost — observed as negative times and >100% "efficiency" in the r4
per-site profiles EVEN after the `* 0` -> `* 1e-12` feedback fix.  The
robust scheme puts the iteration loop INSIDE one jit program with a
`lax.scan` whose carry forces strict serialization; one dispatch per run,
so host/tunnel noise amortizes over the whole scan.

Usage:
    ms = scan_ms(lambda x, w: conv(w, x), x0, extra=(w,))

``fn(x, *extra) -> array-or-pytree``; the scan carry is
``x0 + sum(out) * 1e-12`` (recentred every iteration so values stay
bounded; the tiny term keeps the cross-iteration data dependency that a
zero multiplier lets XLA fold away).  ``x0`` and ``extra`` are passed as
program ARGUMENTS, not closed over — closed-over arrays become HLO
constants, which the tunneled remote compiler rejects (HTTP 413).
"""

import time

import jax
import jax.numpy as jnp


def _make_run(fn, n):
    @jax.jit
    def run(x0, *extra):
        def body(x, _):
            out = fn(x, *extra)
            # sum over EVERY output leaf: an unused leaf would be DCE'd,
            # silently dropping that part of the computation from the
            # timing (e.g. returning only gx from a grad pair lets XLA
            # delete the gw conv — a third of a conv's f+b FLOPs)
            s = sum(
                jnp.sum(leaf.astype(jnp.float32))
                for leaf in jax.tree.leaves(out)
            )
            nxt = x0 + (s * 1e-12).astype(x0.dtype)
            return nxt, None
        y, _ = jax.lax.scan(body, x0, None, length=n)
        return jnp.sum(y.astype(jnp.float32))

    return run


def scan_ms(fn, x0, extra=(), n_small=8, n_large=72, repeats=3):
    """Median per-iteration milliseconds of ``fn`` over ``repeats`` passes."""
    run_s = _make_run(fn, n_small)
    run_l = _make_run(fn, n_large)
    # warmup / compile both programs
    float(run_s(x0, *extra).block_until_ready())
    float(run_l(x0, *extra).block_until_ready())
    samples = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(run_s(x0, *extra).block_until_ready())
        ts = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(run_l(x0, *extra).block_until_ready())
        tl = time.perf_counter() - t0
        samples.append((tl - ts) / (n_large - n_small) * 1e3)
    samples.sort()
    return samples[len(samples) // 2]
