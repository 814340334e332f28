#!/usr/bin/env python
"""Per-stage fwd+bwd timings of the differentiable fused block-FFN vs the
composed (shifts-cvjp) training path, at the B=8 480² train geometry.

Each stage times value_and_grad of sum(block-half(x)) wrt (x, params) —
the exact work the train step's FFN half does — for both implementations.

Usage:
    python tools/bench_ffn_train.py [--stages 1 2 3] [--frames 32]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

STAGES = {
    1: (120, 120, 64, 256),
    2: (60, 60, 128, 512),
    3: (30, 30, 320, 1280),
    4: (15, 15, 512, 2048),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stages", type=int, nargs="*", default=(1, 2, 3))
    ap.add_argument("--frames", type=int, default=32)
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    from vss_cffm_tpu.ops.dwconv import dwconv3x3
    from vss_cffm_tpu.ops.mixffn import (_pick_th_train, block_ffn_train,
                                         block_ffn_train_fits)
    from vss_cffm_tpu.utils import enable_compilation_cache
    from vss_cffm_tpu.utils.benchmark import time_apply_chunked

    enable_compilation_cache()
    rng = np.random.RandomState(0)
    bsz = args.frames

    for s in args.stages:
        h, w, c, ch = STAGES[s]
        wp = -(-(w + 2) // 8) * 8
        th = _pick_th_train(h, wp, c, ch, 2)
        x = jnp.asarray(rng.randn(bsz, h, w, c), jnp.bfloat16)
        gamma = jnp.asarray(1.0 + 0.1 * rng.randn(c), jnp.float32)
        beta = jnp.asarray(0.1 * rng.randn(c), jnp.float32)
        w1 = jnp.asarray(rng.randn(c, ch) * 0.05, jnp.float32)
        b1 = jnp.asarray(rng.randn(ch) * 0.05, jnp.float32)
        kdw = jnp.asarray(rng.randn(3, 3, 1, ch) * 0.2, jnp.float32)
        bdw = jnp.asarray(rng.randn(ch) * 0.05, jnp.float32)
        w2 = jnp.asarray(rng.randn(ch, c) * 0.05, jnp.float32)
        b2 = jnp.asarray(rng.randn(c) * 0.05, jnp.float32)
        scale = jnp.ones((bsz,), jnp.float32)
        params = (gamma, beta, w1, b1, kdw, bdw, w2, b2)

        def composed(xx, *p):
            g, be, k1, bb1, kd, bd, k2, bb2 = p
            dt = xx.dtype
            xf = xx.astype(jnp.float32)
            mu = jnp.mean(xf, axis=-1, keepdims=True)
            var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
            ln = ((xf - mu) * jax.lax.rsqrt(var + 1e-6) * g + be).astype(dt)
            hid = ln @ k1.astype(dt) + bb1.astype(dt)
            hid = dwconv3x3(hid, kd, bd, gelu=True, train=True)
            out = hid.astype(dt) @ k2.astype(dt) + bb2.astype(dt)
            return (xf + out.astype(jnp.float32)).astype(dt)

        def loss_composed(xx):
            def f(*p):
                return jnp.sum(composed(xx, *p).astype(jnp.float32))
            val, grads = jax.value_and_grad(f, argnums=tuple(range(8)))(*params)
            return val + sum(jnp.sum(g_) for g_ in jax.tree.leaves(grads))

        def loss_kernel(xx):
            def f(*p):
                return jnp.sum(block_ffn_train(xx, *p, scale, 1e-6,
                                               False).astype(jnp.float32))
            val, grads = jax.value_and_grad(f, argnums=tuple(range(8)))(*params)
            return val + sum(jnp.sum(g_) for g_ in jax.tree.leaves(grads))

        fits = block_ffn_train_fits(h, w, c, ch, 2)
        t_c = time_apply_chunked(loss_composed, x, iters=args.iters,
                                 chunk=min(args.iters, 15))
        line = (f"stage {s} ({bsz},{h},{w},{c})x{ch} th={th}: "
                f"composed {t_c * 1e3:7.3f} ms")
        if fits:
            try:
                t_k = time_apply_chunked(loss_kernel, x, iters=args.iters,
                                         chunk=min(args.iters, 15))
                line += f"   kernel {t_k * 1e3:7.3f} ms  ratio {t_k / t_c:.2f}"
            except Exception as e:  # noqa: BLE001
                line += f"   kernel FAILED {type(e).__name__}: {str(e)[:120]}"
        else:
            line += "   kernel: does not fit VMEM"
        print(line)


if __name__ == "__main__":
    main()
