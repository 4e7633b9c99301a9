"""fwd+bwd timing: ConvTranspose vs phase-packed conv (up_2_0 shape)."""

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

B = 16


def chained_time(fn, *args, n_small=4, n_large=24):
    x = args[0]

    def run(n):
        xx = x
        out = None
        for _ in range(n):
            out = fn(xx, *args[1:])
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

    tconv = nn.ConvTranspose(cout, (3, 3, 3), strides=(2, 2, 2),
                             padding="SAME", use_bias=False)
    vt = tconv.init(jax.random.PRNGKey(0), x)
    conv_pack = nn.Conv(8 * cout, (2, 2, 2), padding="SAME", use_bias=False)
    vp = conv_pack.init(jax.random.PRNGKey(0), x)

    def loss_t(x):
        return jnp.sum(tconv.apply(vt, x).astype(jnp.float32) ** 2)

    def loss_p(x):
        y = conv_pack.apply(vp, x)
        b, d, h, w, _ = y.shape
        y = y.reshape(b, d, h, w, 2, 2, 2, cout)
        y = y.transpose(0, 1, 4, 2, 5, 3, 6, 7).reshape(
            b, 2 * d, 2 * h, 2 * w, cout)
        return jnp.sum(y.astype(jnp.float32) ** 2)

    for name, loss in [("tconv", loss_t), ("packed+interleave", loss_p)]:
        f = jax.jit(lambda x, fn=loss: fn(x) * 0 + jnp.mean(x))  # fwd-only proxy skipped
        g = jax.jit(jax.grad(loss))
        print(f"{name:20s} f+b {chained_time(g, x):7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
