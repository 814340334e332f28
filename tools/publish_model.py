#!/usr/bin/env python
"""Publish a training checkpoint as a lean, content-addressed artifact.

Parity with reference ``tools/publish_model.py``: strip the optimizer state
(the bulk of a train checkpoint) and stamp the output name with the first 8
hex chars of a content hash. TPU-native shape: the input is an orbax
``CheckpointManager`` directory written by ``tools/train.py``; the output is
a params+batch_stats-only orbax checkpoint directory named
``<out>-<sha8>`` with the CLASSES/PALETTE/config metadata JSON carried over
(so ``init_segmentor``/``tools/test.py`` can read it back).

    python tools/publish_model.py work_dirs/cffm_b1 published/cffm_b1
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

# Publishing is a host-side file operation — keep it off the (single,
# shared) TPU. Env var alone loses to the registered PJRT plugin; the
# config update wins (same dance as tests/conftest.py).
os.environ["JAX_PLATFORMS"] = "cpu"
import jax

jax.config.update("jax_platforms", "cpu")
import numpy as np


def content_hash(tree) -> str:
    """sha256 over the leaves in deterministic key order."""
    h = hashlib.sha256()
    for path, leaf in sorted(
        jax.tree_util.tree_leaves_with_path(tree), key=lambda kv: jax.tree_util.keystr(kv[0])
    ):
        h.update(jax.tree_util.keystr(path).encode())
        arr = np.asarray(leaf)
        h.update(str(arr.dtype).encode())
        h.update(str(arr.shape).encode())
        h.update(np.ascontiguousarray(arr).tobytes())
    return h.hexdigest()


def main():
    ap = argparse.ArgumentParser(description="Process a checkpoint to be published")
    ap.add_argument("in_dir", help="input CheckpointManager directory")
    ap.add_argument("out_dir", help="output checkpoint directory (sha8 appended)")
    ap.add_argument("--step", type=int, default=None, help="step to publish (default: latest)")
    args = ap.parse_args()

    import orbax.checkpoint as ocp

    from vss_cffm_tpu.train import CheckpointManager

    mgr = CheckpointManager(args.in_dir)
    step = args.step if args.step is not None else mgr.latest_step()
    if step is None:
        raise SystemExit(f"no checkpoints in {args.in_dir}")
    # template-free pytree; PyTreeRestore reads sharding info from file, so
    # a checkpoint written on TPU publishes fine from a CPU-only host
    raw = mgr._mgr.restore(step, args=ocp.args.PyTreeRestore())
    lean = {"params": raw["params"], "batch_stats": raw.get("batch_stats") or {}}

    sha = content_hash(lean)
    out = os.path.abspath(args.out_dir.rstrip("/")) + f"-{sha[:8]}"
    if os.path.exists(out):
        shutil.rmtree(out)
    # same on-disk layout as a CheckpointManager dir at step 0 so
    # init_segmentor's load_params path reads it unchanged
    with ocp.CheckpointManager(
        out, options=ocp.CheckpointManagerOptions(max_to_keep=1, create=True)
    ) as out_mgr:
        out_mgr.save(0, args=ocp.args.StandardSave(lean))
        out_mgr.wait_until_finished()
    meta = mgr.metadata(step)
    if meta is not None:
        with open(os.path.join(out, "metadata_0.json"), "w") as f:
            json.dump(meta, f)
    print(out)


if __name__ == "__main__":
    main()
