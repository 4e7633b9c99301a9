"""Sweep (batch, steps_per_call) for the flagship train step on the chip.

Usage: python scripts/sweep_bench.py [b,k [b,k ...]]   (default sweep below)
Each config compiles its own program; with the persistent compilation cache
(/tmp/jax_cache) repeats are cheap.
"""

import os
import sys

import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

import bench  # noqa: E402


def main():
    configs = [tuple(map(int, a.split(","))) for a in sys.argv[1:]] or [
        (16, 4), (16, 8), (24, 4), (32, 4),
    ]
    for b, k in configs:
        # one bad config (e.g. a compile-time VMEM OOM at large batch) must
        # not kill the remaining legs — the r4 sweep died at b=32 on the
        # x_2_2 flash-bwd scoped-vmem cliff and lost nothing but its own leg
        try:
            cps, mfu, spread = bench.bench_train(b, steps_per_call=k)
        except Exception as e:  # noqa: BLE001
            print(f"batch {b:3d} k {k}: FAILED {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:200]}", flush=True)
            continue
        print(f"batch {b:3d} k {k}: {cps:7.2f} clips/s  "
              + (f"MFU {mfu:.3f}  " if mfu else "")
              + f"spread {spread * 100:.1f}%",
              flush=True)


if __name__ == "__main__":
    main()
