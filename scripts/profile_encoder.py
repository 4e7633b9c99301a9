"""Decompose the encoder's time on the real chip (VERDICT round-2 item 1).

The round-2 decomposition put the encoder at 16.8 ms of the 113 ms train
step vs an ~8 ms FLOPs roofline, blaming stage 3's 36 bottlenecks at
[2,7,7] spatial.  This script measures, with chained N-differencing:

  1. encoder fwd / fwd+bwd per stage (truncated encoders)
  2. one stage-3 bottleneck in isolation (fwd, fwd+bwd), x36 extrapolation
  3. micro-alternatives for the stage-3 hot ops:
       - (1,3,3) conv at 7x7 spatial: XLA conv vs im2col GEMM
       - 1x1x1 reduce conv as GEMM

Weights are always passed as jit ARGUMENTS (closed-over arrays become HLO
constants, which the tunneled remote compiler rejects with HTTP 413).
"""

import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sap3d_tpu.models.p3d import Bottleneck, P3DEncoder


# scan-chained timing: the loop lives inside ONE jit program so per-
# dispatch tunnel jitter amortizes (scripts/_scan_timer.py).  Adapter only:
# this file's step functions take (extra..., x); scan_ms wants (x, extra...).
from _scan_timer import scan_ms


def chained(step, x0, extra=(), n_small=8, n_large=40):
    return scan_ms(lambda x, *e: step(*e, x), x0, extra=extra,
                   n_small=n_small, n_large=n_large)


def report(name, ms):
    print(f"{name:46s} {ms:8.2f} ms", flush=True)


def encoder_stages(batch=16):
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(batch, 16, 112, 112, 3))
        .astype(np.float32) * 0.3
    )
    full_stages = ((64, 3), (128, 8), (256, 36))
    for n_stages in (0, 1, 2, 3):
        stages = full_stages[:n_stages]
        enc = P3DEncoder(stages=stages, dtype=jnp.bfloat16)
        v = enc.init(jax.random.PRNGKey(0), x, train=True)
        last = f"pool{len(stages) + 1}" if stages else "pool1"

        @jax.jit
        def fwd(v, f, enc=enc, last=last):
            feats, _ = enc.apply(v, f, train=True, mutable=["batch_stats"])
            return feats[last]

        ms_f = chained(fwd, x, extra=(v,))

        @jax.jit
        def fwdbwd(v, f, enc=enc, last=last):
            def loss(params):
                feats, _ = enc.apply(
                    {"params": params, "batch_stats": v["batch_stats"]},
                    f, train=True, mutable=["batch_stats"])
                return jnp.sum(feats[last].astype(jnp.float32))
            # return the FULL tree: returning one leaf lets XLA DCE the
            # other per-param gradient convs out of the timed program
            return jax.grad(loss)(v["params"])

        ms_fb = chained(fwdbwd, x, extra=(v,))
        report(f"encoder[{n_stages} stages] fwd", ms_f)
        report(f"encoder[{n_stages} stages] fwd+bwd", ms_fb)


def one_block(batch=16, norm="bn", st="B", n_rep=6):
    """n_rep chained stage-3 bottlenecks (same weights); per-block ms."""
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(batch, 2, 7, 7, 1024))
        .astype(np.float32) * 0.3, jnp.bfloat16
    )
    blk = Bottleneck(planes=256, st_type=st, norm_mode=norm,
                     dtype=jnp.bfloat16)
    v = blk.init(jax.random.PRNGKey(0), x, train=True)

    @jax.jit
    def fwd(v, f):
        h = f
        for _ in range(n_rep):
            if norm == "bn":
                h = blk.apply(v, h, train=True, mutable=["batch_stats"])[0]
            else:
                h = blk.apply(v, h, train=True)
        return h

    ms_f = chained(fwd, x, extra=(v,)) / n_rep

    @jax.jit
    def fwdbwd(v, f):
        def loss(params):
            h = f
            vv = dict(v, params=params)
            for _ in range(n_rep):
                if norm == "bn":
                    h = blk.apply(vv, h, train=True, mutable=["batch_stats"])[0]
                else:
                    h = blk.apply(vv, h, train=True)
            return jnp.sum(h.astype(jnp.float32))
        return jax.grad(loss)(v["params"])  # full tree: no DCE of dW convs

    ms_fb = chained(fwdbwd, x, extra=(v,)) / n_rep
    report(f"stage3 block [{st},{norm}] fwd (x36={ms_f * 36:.1f})", ms_f)
    report(f"stage3 block [{st},{norm}] fwd+bwd (x36={ms_fb * 36:.1f})", ms_fb)


def micro_convs(batch=16):
    rng = np.random.default_rng(1)
    xs = jnp.asarray(rng.normal(size=(batch, 2, 7, 7, 256)), jnp.bfloat16)
    xin = jnp.asarray(rng.normal(size=(batch, 2, 7, 7, 1024)), jnp.bfloat16)
    w_s = jnp.asarray(rng.normal(size=(1, 3, 3, 256, 256)) * 0.03, jnp.bfloat16)
    w_r = jnp.asarray(rng.normal(size=(1024, 256)) * 0.03, jnp.bfloat16)

    @jax.jit
    def conv_s(w, x):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=jnp.float32).astype(x.dtype)

    @jax.jit
    def conv_s_im2col(w, x):
        xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1), (0, 0)))
        taps = [xp[:, :, i:i + 7, j:j + 7, :] for i in range(3)
                for j in range(3)]
        t = jnp.concatenate(taps, axis=-1)  # [B,D,7,7,9C]
        wk = w.reshape(9 * 256, 256)
        return jnp.einsum("bdhwc,co->bdhwo", t, wk,
                          preferred_element_type=jnp.float32).astype(x.dtype)

    @jax.jit
    def reduce_conv(w, x):
        return jnp.einsum("bdhwc,co->bdhwo", x, w,
                          preferred_element_type=jnp.float32).astype(x.dtype)

    for name, f, w, x0 in (
        ("conv_s (1,3,3)@7x7 XLA conv", conv_s, w_s, xs),
        ("conv_s im2col GEMM", conv_s_im2col, w_s, xs),
        ("reduce 1x1x1 GEMM 1024->256", reduce_conv, w_r, xin),
    ):
        report(name, chained(f, x0, extra=(w,)))


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "stages"):
        encoder_stages()
    if which in ("all", "block"):
        for st in ("A", "B", "C"):
            one_block(st=st)
        one_block(norm="gn")
    if which in ("all", "micro"):
        micro_convs()


if __name__ == "__main__":
    main()
