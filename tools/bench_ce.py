#!/usr/bin/env python
"""Isolated device timings of the fused CE loss kernels (v2 vs v3).

The round-5 train profile put the v2 CE pair at 30.2 ms of the 171 ms B=8
step (~8x its op-count roofline); v3 re-lays-out the kernels (rank-3
everywhere, w-major labels, sublane-roll shifts). This microbench times
each kernel alone at the train geometry so layout experiments don't need a
full train-step compile.

Usage:
    python tools/bench_ce.py [--n 32] [--hw 120 120] [--c 124] [--ch 8 4]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=32)
    ap.add_argument("--hw", type=int, nargs=2, default=(120, 120))
    ap.add_argument("--c", type=int, default=124)
    ap.add_argument("--s", type=int, default=4)
    ap.add_argument("--iters", type=int, default=40)
    ap.add_argument("--chunk", type=int, default=20)
    ap.add_argument("--ch", type=int, nargs="*", default=(8,),
                    help="row-chunk values to sweep for the v3 kernels")
    ap.add_argument("--skip-v2", action="store_true")
    ap.add_argument("--skip-v3", action="store_true")
    args = ap.parse_args()

    import vss_cffm_tpu.ops.ce_upsampled as ceu
    from vss_cffm_tpu.utils import enable_compilation_cache
    from vss_cffm_tpu.utils.benchmark import time_apply_chunked

    enable_compilation_cache()
    n, (h, w), c, s = args.n, args.hw, args.c, args.s
    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.randn(n, h, w, c), jnp.bfloat16)
    labels = rng.randint(0, 140, (n, h * s, w * s))
    labels = np.where(labels >= c, 255, labels).astype(np.uint8)
    lph = ceu.labels_to_phase(jnp.asarray(labels), s)
    lphw = jnp.swapaxes(lph, 2, 3)
    img_w = 0.5 / float(labels.size)
    ct = jnp.ones((), jnp.float32)

    def bench(name, fn):
        t = time_apply_chunked(fn, logits, iters=args.iters, chunk=args.chunk)
        print(f"{name:34s} {t * 1e3:8.3f} ms")
        return t

    if not args.skip_v2:
        for ch in args.ch:
            try:
                bench(f"v2 fwd (ch={ch})",
                      lambda x, ch=ch: ceu._ce_fwd_loss_pallas(
                          x, lph, s, img_w, True, ch=ch)[0])
            except Exception as e:  # noqa: BLE001
                print(f"v2 fwd (ch={ch}) FAILED: {str(e)[:150]}")
        bench("v2 bwd (ch=4)",
              lambda x: ceu._ce_bwd_loss_pallas(x, lph, ct, s, c, img_w))
    for ch in args.ch:
        for name, fn in (
            ("v5 fwd", lambda x, ch=ch: ceu._ce_fwd_loss_pallas5(
                x, lphw, s, img_w, True, ch=ch)[0]),
            ("v5 bwd", lambda x, ch=ch: ceu._ce_bwd_loss_pallas5(
                x, lphw, ct, s, c, img_w, ch=ch)),
            ("v3 fwd", lambda x, ch=ch: ceu._ce_fwd_loss_pallas3(
                x, lphw, s, img_w, True, ch=ch)[0]),
            ("v3 bwd", lambda x, ch=ch: ceu._ce_bwd_loss_pallas3(
                x, lphw, ct, s, c, img_w, ch=ch)),
        ):
            if args.skip_v3 and name.startswith("v3"):
                continue
            try:
                bench(f"{name} (ch={ch})", fn)
            except Exception as e:  # noqa: BLE001 - report, continue sweep
                print(f"{name} (ch={ch}) FAILED: "
                      f"{type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
