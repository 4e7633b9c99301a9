"""Per-site timing of the self-attention blocks (fwd+bwd) on the real chip.

The flagship (p3d_unetplusplus_ds) has 4 SA sites; this times each one's
attend-tokens core in isolation — Pallas vs XLA — to locate where the
attention share of the train step lives.  Uses bench.py's chained
N-differencing methodology (the tunneled runtime makes naive timing
meaningless, see bench.py docstring).
"""

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
import jax.numpy as jnp
import numpy as np

from sap3d_tpu.ops.attention import attend_tokens
from sap3d_tpu.ops.pallas.flash_attention import (
    flash_attend_tokens,
    flash_attention_viable,
)

B = 16

# (name, (D,H,W), C, subsample)
SITES = [
    ("x_4_0", (1, 7, 7), 1024, False),
    ("x_3_1", (2, 14, 14), 512, False),
    ("x_2_2", (4, 28, 28), 256, False),
    ("x_1_3", (8, 56, 56), 128, True),
]


# scan-chained timing, one dispatch per run (scripts/_scan_timer.py):
# Python-level chaining of 1-10 ms attention sites drowns in tunnel
# dispatch jitter.
from _scan_timer import scan_ms


def main():
    rng = np.random.default_rng(0)
    for name, (d, h, w), c, sub in SITES:
        inter = max(1, c // 8)
        nq = d * h * w
        nk = nq // 8 if sub else nq
        q = jnp.asarray(rng.normal(size=(B, nq, inter)), jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=(B, nk, inter)), jnp.bfloat16)
        v = jnp.asarray(rng.normal(size=(B, nk, c)), jnp.bfloat16)

        viable = flash_attention_viable(nq, nk, inter, c, itemsize=2)

        # fwd step returns something q-shaped to chain; use grad-wrt-q for bwd
        def fwd_p(q, k, v):
            return flash_attend_tokens(q, k, v)[:, :, : q.shape[-1]]

        def fwd_x(q, k, v):
            return attend_tokens(q, k, v)[:, :, : q.shape[-1]]

        def make_bwd(f):
            def loss(q, k, v):
                # quadratic loss + grads w.r.t. ALL THREE inputs: a linear
                # loss/partial grad set lets XLA hoist or DCE parts of the
                # backward out of the timed program (profile_decoder.py)
                return 0.5 * jnp.sum(f(q, k, v).astype(jnp.float32) ** 2)

            return jax.grad(loss, argnums=(0, 1, 2))

        row = [
            f"{name:7s} nq={nq:6d} nk={nk:5d} d={inter:3d} c={c:4d} "
            f"viable={viable}"
        ]
        if viable:
            row.append(f"pallas fwd {scan_ms(fwd_p, q, extra=(k, v)):7.2f}ms")
            row.append(
                f"f+b {scan_ms(make_bwd(flash_attend_tokens), q, extra=(k, v)):7.2f}ms"
            )
        row.append(f"| xla fwd {scan_ms(fwd_x, q, extra=(k, v)):7.2f}ms")
        row.append(
            f"f+b {scan_ms(make_bwd(attend_tokens), q, extra=(k, v)):7.2f}ms"
        )
        print("  ".join(row), flush=True)


if __name__ == "__main__":
    main()
