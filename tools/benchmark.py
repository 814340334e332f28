#!/usr/bin/env python
"""Inference FPS benchmark (parity with reference ``tools/benchmark.py:50-82``:
200 timed iterations, 5 warmup, batch 1, device-synchronised).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

# honor JAX_PLATFORMS=cpu even though the axon TPU plugin would otherwise win
if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from vss_cffm_tpu.config import apply_overrides, load_config
from vss_cffm_tpu.models import CFFMSegmentor
from vss_cffm_tpu.utils import enable_compilation_cache


def benchmark_model(cfg, shape=(480, 864), iters=200, warmup=5, train_clip=4, batch=1):
    from vss_cffm_tpu.utils.benchmark import time_apply_chunked

    model = CFFMSegmentor(cfg.model, dtype=jnp.bfloat16 if cfg.bf16 else jnp.float32)
    h, w = shape
    imgs = jnp.asarray(np.random.RandomState(0).randn(batch, train_clip, h, w, 3),
                       jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), imgs[:1])
    dt = time_apply_chunked(lambda x: model.apply(variables, x, False), imgs,
                            iters=iters, warmup=warmup)
    return batch / dt  # clips (target frames) per second


def benchmark_streaming(cfg, shape=(480, 864), iters=100, train_clip=4):
    """Streaming per-frame steady state: one backbone+decode pass on the new
    frame plus one CFM pass over the cached clip window — the evaluator's
    ``run_streaming`` inner loop (``eval/evaluator.py:297``), reference
    protocol one output frame per step."""
    from vss_cffm_tpu.utils.benchmark import time_apply_chunked

    model = CFFMSegmentor(cfg.model, dtype=jnp.bfloat16 if cfg.bf16 else jnp.float32)
    h, w = shape
    rng = np.random.RandomState(0)
    frame = jnp.asarray(rng.randn(1, h, w, 3), jnp.float32)
    imgs = jnp.asarray(rng.randn(1, train_clip, h, w, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), imgs)
    dt1 = time_apply_chunked(
        lambda x: model.apply(variables, x, method=model.frame_features),
        frame, iters=iters, chunk=min(iters, 50))
    embed_dim = cfg.model.head.embed_dim
    fused = jnp.asarray(rng.randn(1, train_clip, h // 4, w // 4, embed_dim),
                        jnp.bfloat16 if cfg.bf16 else jnp.float32)
    dt2 = time_apply_chunked(
        lambda f: model.apply(variables, f, None,
                              method=model.predict_from_features),
        fused, iters=iters, chunk=min(iters, 50))
    return {"frame_features_ms": round(dt1 * 1e3, 3),
            "predict_ms": round(dt2 * 1e3, 3),
            "frames_per_sec": round(1 / (dt1 + dt2), 1)}


def benchmark_train(cfg, iters=30, warmup=3, batch=None):
    """Train-step throughput at the config's train geometry (VERDICT r3 #2).

    Steps chain through the donated TrainState (a real data dependency), so
    one scalar metrics readback at the end forces the whole run; the
    tunnel roundtrip is calibrated out like ``time_apply_chunked``.
    Reference geometry: B=8 global batch, 480² crops, 4-frame clips
    (``local_configs/cffm/B1/cffm.b1.480x480.vspw2.160k.py:48``).
    """
    import time

    from vss_cffm_tpu.train import TrainState, build_optimizer, make_train_step
    from vss_cffm_tpu.utils.benchmark import measure_roundtrip

    model = CFFMSegmentor(cfg.model, dtype=jnp.bfloat16 if cfg.bf16 else jnp.float32)
    b = batch or cfg.data.batch_size
    t = len(cfg.data.dilation) + 1
    h, w = cfg.data.crop_size
    rng = np.random.RandomState(0)
    batch_data = {
        "imgs": jnp.asarray(rng.randn(b, t, h, w, 3), jnp.float32),
        "labels": jnp.asarray(rng.randint(0, cfg.model.head.num_classes,
                                          (b, t, h, w)), jnp.int32),
    }
    init_kw = {}
    if cfg.model.head.mode == "finetune":
        # CFFM++ finetune consumes per-video k-means centres (the 80%-subset
        # store pads to 100 per video — eval/prototypes.py)
        batch_data["cluster_centers"] = jnp.asarray(
            rng.randn(b, 100, cfg.model.head.embed_dim), jnp.float32)
        init_kw["cluster_centers"] = batch_data["cluster_centers"][:1]
    variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                    batch_data["imgs"][:1], **init_kw)
    tx = build_optimizer(variables["params"], cfg.optim)
    state = TrainState.create(variables, tx)
    step = make_train_step(model, tx)
    key = jax.random.PRNGKey(1)
    for i in range(warmup):  # compile + settle
        state, m = step(state, batch_data, jax.random.fold_in(key, i))
    float(m["loss_seg"])
    t0 = time.perf_counter()
    for i in range(iters):
        state, m = step(state, batch_data, jax.random.fold_in(key, warmup + i))
    loss = float(m["loss_seg"])  # forces the chained run
    dt = (time.perf_counter() - t0 - measure_roundtrip()) / iters
    assert np.isfinite(loss)
    return {"train_ms_per_iter": round(dt * 1e3, 1),
            "frames_per_sec": round(b * t / dt, 1),
            "batch": b, "clip": t, "crop": f"{h}x{w}", "loss": round(loss, 3)}


def main():
    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("--shape", type=int, nargs=2, default=[480, 864])
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--train", action="store_true",
                    help="benchmark the jitted train step at the config's "
                         "train geometry instead of clip inference")
    ap.add_argument("--streaming", action="store_true",
                    help="benchmark the streaming per-frame steady state "
                         "(cached-feature evaluator inner loop)")
    ap.add_argument("--probs-f32", action="store_true",
                    help="store the CFM backward softmax-probs residual in "
                         "f32 (the default since round 4; kept as a no-op "
                         "probe flag)")
    ap.add_argument("--probs-compute-dtype", action="store_true",
                    help="store the CFM backward softmax-probs residual in "
                         "the compute dtype (bf16 under the bf16 config) "
                         "instead of the f32 default (cost probe)")
    ap.add_argument("--options", nargs="*", default=[])
    args = ap.parse_args()
    cfg = apply_overrides(load_config(args.config), args.options)
    if args.probs_f32:
        import vss_cffm_tpu.ops.cfm_attention as cfm

        cfm._PROBS_DTYPE = jnp.float32
    if args.probs_compute_dtype:
        import vss_cffm_tpu.ops.cfm_attention as cfm

        cfm._PROBS_DTYPE = None
    if args.train:
        out = benchmark_train(cfg, iters=min(args.iters, 50), batch=args.batch)
        print(f"train: {out}")
        return
    if args.streaming:
        out = benchmark_streaming(cfg, tuple(args.shape), min(args.iters, 100))
        print(f"streaming: {out}")
        return
    fps = benchmark_model(cfg, tuple(args.shape), args.iters,
                          batch=args.batch or 1)
    print(f"fps: {fps:.2f} (clip inference at {args.shape[0]}x{args.shape[1]}, "
          f"batch {args.batch or 1})")


if __name__ == "__main__":
    main()
