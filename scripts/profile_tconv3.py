"""Forward-only decomposition: where does the phase-tconv path lose?

Variants for the up_2_0 shape ([16,4,28,28,256] -> [16,8,56,56,128]):
  A. nn.ConvTranspose (the dilated baseline)
  B. packed k2 conv only (phase-blocked output, no interleave)
  C. B + reshape/transpose/reshape interleave to the true layout
  D. C + BatchNorm-style scale+shift (fusion probe)
  E. A + BatchNorm-style scale+shift (fusion probe)
"""

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from sap3d_tpu.ops.fast_tconv import _phase_tconv

B = 16


def chained_time(fn, x, n_small=4, n_large=24):
    def run(n):
        xx = x
        out = None
        for _ in range(n):
            out = fn(xx)
            xx = x + jnp.mean(out).astype(x.dtype)
        return float(jnp.sum(out.astype(jnp.float32)).block_until_ready())

    run(2)
    t0 = time.perf_counter()
    run(n_small)
    t_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    run(n_large)
    t_l = time.perf_counter() - t0
    return (t_l - t_s) / (n_large - n_small) * 1e3


def main():
    rng = np.random.default_rng(0)
    cin, cout = 256, 128
    x = jnp.asarray(rng.normal(size=(B, 4, 28, 28, cin)), jnp.bfloat16)
    w_t = jnp.asarray(rng.normal(size=(3, 3, 3, cin, cout)) * 0.05,
                      jnp.bfloat16)
    w_p = jnp.asarray(rng.normal(size=(2, 2, 2, cin, 8 * cout)) * 0.05,
                      jnp.bfloat16)
    scale = jnp.asarray(rng.normal(size=(cout,)), jnp.bfloat16)
    shift = jnp.asarray(rng.normal(size=(cout,)), jnp.bfloat16)

    def tconv(x):
        return jax.lax.conv_transpose(
            x, w_t, strides=(2, 2, 2), padding="SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            transpose_kernel=False,
        )

    def packed(x):
        return jax.lax.conv_general_dilated(
            x, w_p, (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )

    def interleaved(x):
        y = packed(x)
        b, d, h, w, _ = y.shape
        y = y.reshape(b, d, h, w, 2, 2, 2, cout)
        return y.transpose(0, 1, 4, 2, 5, 3, 6, 7).reshape(
            b, 2 * d, 2 * h, 2 * w, cout)

    def phase_full(x):
        return _phase_tconv(x, w_t, (2, 2, 2))

    cases = [
        ("A tconv", jax.jit(tconv)),
        ("B packed only", jax.jit(packed)),
        ("C packed+interleave", jax.jit(interleaved)),
        ("D C+affine", jax.jit(lambda x: interleaved(x) * scale + shift)),
        ("E A+affine", jax.jit(lambda x: tconv(x) * scale + shift)),
        ("F phase_tconv op", jax.jit(phase_full)),
    ]
    for name, f in cases:
        print(f"{name:22s} {chained_time(f, x):7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
