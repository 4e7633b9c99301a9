"""Time the flagship decoder's heavy convs on the real chip, with achieved
TFLOP/s vs the v5e bf16 peak (197 T).

Round-3 finding: the full encoder fwd+bwd measures 8.7 ms (profile_encoder.py)
— already at its roofline; the round-2 'encoder 16.8 ms' decomposition was
misattributed.  The step's FLOPs (10.65 T by XLA cost analysis) are dominated
by the x_1_* 3^3 convs at [B,8,56,56] and the x_2_* convs at [B,4,28,28].
This script measures each site's fwd and fwd+bwd time in isolation.
"""

import os
import sys
import time

import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
import jax.numpy as jnp
import numpy as np

PEAK = 197e12


# scan-chained timing: the loop lives INSIDE one jit program (one dispatch
# per run) because Python-level chaining of 1-10 ms ops drowns in per-
# dispatch tunnel jitter — see scripts/_scan_timer.py for the full story.
from _scan_timer import scan_ms  # noqa: E402


def conv_site(name, in_shape, cout, kernel, strides=(1, 1, 1), batch=16,
              transpose=False):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(batch,) + in_shape), jnp.bfloat16)
    cin = in_shape[-1]
    w = jnp.asarray(rng.normal(size=kernel + (cin, cout)) * 0.02, jnp.bfloat16)

    if transpose:
        # no preferred_element_type: with bf16 operands this jax version
        # builds a mismatched-dtype conv in the VJP (bf16 kernel vs f32
        # cotangent); the MXU accumulates fp32 internally regardless
        def f(x, w):
            return jax.lax.conv_transpose(
                x, w, strides, "SAME",
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        out_sp = tuple(s * st for s, st in zip(in_shape[:-1], strides))
    else:
        def f(x, w):
            return jax.lax.conv_general_dilated(
                x, w, strides, "SAME",
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        out_sp = tuple(-(-s // st) for s, st in zip(in_shape[:-1], strides))

    taps = int(np.prod(kernel))
    out_pos = batch * int(np.prod(out_sp))
    flops_f = 2 * out_pos * taps * cin * cout
    if transpose:
        flops_f //= int(np.prod(strides))
        flops_f *= int(np.prod(strides))  # same total MACs as fwd conv pair
    ms_f = scan_ms(f, x, extra=(w,))

    def fb(x, w):
        # QUADRATIC loss: with a linear sum(conv) loss the cotangent is
        # constant, gx becomes x-independent, and XLA hoists the entire
        # backward out of the timing loop (observed: "f+b" faster than
        # fwd).  sum(conv^2)/2 makes the cotangent conv(x) itself, so the
        # timed program is the honest fwd + dx + dw conv triple.
        def loss(w, x):
            y = f(x, w).astype(jnp.float32)
            return 0.5 * jnp.sum(y * y)
        gw, gx = jax.grad(loss, argnums=(0, 1))(w, x)
        return gx, gw

    ms_fb = scan_ms(fb, x, extra=(w,))
    eff_f = flops_f / (ms_f * 1e-3) / PEAK
    eff_fb = 3 * flops_f / (ms_fb * 1e-3) / PEAK
    print(f"{name:34s} fwd {ms_f:7.2f} ms ({eff_f * 100:4.0f}%)   "
          f"f+b {ms_fb:7.2f} ms ({eff_fb * 100:4.0f}%)", flush=True)


def main():
    b = 16
    conv_site("x_1_3 conv 3^3 256->128 @8x56x56", (8, 56, 56, 256), 128,
              (3, 3, 3), batch=b)
    conv_site("x_1_1 conv 3^3 192->128 @8x56x56", (8, 56, 56, 192), 128,
              (3, 3, 3), batch=b)
    conv_site("x_2_2 conv 3^3 512->256 @4x28x28", (4, 28, 28, 512), 256,
              (3, 3, 3), batch=b)
    conv_site("x_3_1 conv (2,3,3) 1024->512 @2x14", (2, 14, 14, 1024), 512,
              (2, 3, 3), batch=b)
    conv_site("up_2_2 tconv 3^3 s2 256->128", (4, 28, 28, 256), 128,
              (3, 3, 3), strides=(2, 2, 2), batch=b, transpose=True)
    conv_site("x_0_1 tconv 3^3 s2 128->1", (8, 56, 56, 128), 1,
              (3, 3, 3), strides=(2, 2, 2), batch=b, transpose=True)
    conv_site("stem conv (1,7,7) s(1,2,2) 3->64", (16, 112, 112, 3), 64,
              (1, 7, 7), strides=(1, 2, 2), batch=b)


if __name__ == "__main__":
    main()
