"""Shared numeric assertions for the parallelism tests."""

import jax
import numpy as np


def assert_grads_match(grads_sharded, grads_replicated, grads_f64,
                       factor: float = 16.0, min_leaves: int = 50):
    """Tree-wide gradient parity, referenced to an empirical noise floor.

    Cross-sharding gradient differences come only from floating-point
    reduction order, but that noise is unevenly AMPLIFIED: a kernel grad that
    sums millions of near-cancelling terms can deviate by large *relative*
    amounts while being numerically healthy.  Fixed rtol/atol therefore
    either miss real bugs or flake on cancellation-heavy leaves (transpose
    convs are the usual offenders).

    Instead this takes a third gradient tree computed in float64 (same
    function, same inputs) as the oracle and measures, per leaf,

        e_sharded    = || g_sharded    - g_f64 ||
        e_replicated = || g_replicated - g_f64 ||

    e_replicated IS the leaf's f32 round-off noise (including all
    cancellation effects); a correct sharded program differs from f64 by
    noise of the same order, so we assert

        e_sharded <= factor * max(e_replicated, floor)

    with a tiny floor for leaves whose replicated error is accidentally ~0.
    A wrong halo exchange or missing collective produces errors orders of
    magnitude above the noise floor (it corrupts whole kernel slices), so a
    generous ``factor`` loses no detection power.
    """
    paths_s = jax.tree_util.tree_flatten_with_path(grads_sharded)[0]
    leaves_r = [np.asarray(jax.device_get(x), np.float64)
                for x in jax.tree.leaves(grads_replicated)]
    leaves_h = [np.asarray(jax.device_get(x), np.float64)
                for x in jax.tree.leaves(grads_f64)]
    assert len(paths_s) == len(leaves_r) == len(leaves_h) > min_leaves
    for (path, a), b, hi in zip(paths_s, leaves_r, leaves_h):
        a = np.asarray(jax.device_get(a), np.float64)
        name = jax.tree_util.keystr(path)
        scale = np.linalg.norm(hi)
        floor = 1e-7 * scale + 1e-12
        e_sh = np.linalg.norm(a - hi)
        e_ref = np.linalg.norm(b - hi)
        assert e_sh <= factor * max(e_ref, floor), (
            f"{name}: sharded-vs-f64 error {e_sh:.3e} exceeds {factor}x the "
            f"replicated f32 noise floor {max(e_ref, floor):.3e} "
            f"(leaf norm {scale:.3e}) — systematic sharding error"
        )
