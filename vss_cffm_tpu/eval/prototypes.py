"""CFFM++ prototype (cluster-centre) generation and store.

Phase A of CFFM++ (reference ``cffm_head.py:161-301`` + SURVEY §3.4): for
every video, k-means-cluster the fused 1/8 features of 10 uniformly sampled
frames into 100 centroids and persist them per video; phase B (finetune)
loads them per batch element by video name (``cffm_head.py:429-455``).

TPU-native: the k-means is the jitted ``ops.kmeans`` (Lloyd over matmuls)
running on device right after the feature forward; centres are stored as
``<save_dir>/<video>/centers.npy`` float32 arrays. Where the reference
re-reads .pt files from disk on *every* training step (a per-step
disk→GPU copy, ``cffm_head.py:435``), ``ClusterStore`` memoises centres in
host RAM after first load.

When several centre files exist for a video the reference concatenates them
and keeps a random 80% subset (``:444-452``); we reproduce that and then
resample/pad back to exactly ``n_clusters`` rows so batch shapes stay static
under jit.
"""

from __future__ import annotations

import glob
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.kmeans import kmeans

__all__ = ["generate_prototypes", "ClusterStore"]


def generate_prototypes(
    model,
    params,
    batch_stats,
    dataset,
    save_dir: str,
    n_clusters: int = 100,
    max_iter: int = 10,
    seed: int = 0,
    num_frames: int = 10,
) -> None:
    """Run phase A over every video of ``dataset`` (prototype split)."""

    @jax.jit
    def features(imgs):
        f = model.apply(
            {"params": params, "batch_stats": batch_stats},
            imgs[None],
            method=model.prototype_features,
        )  # (1, T, h, w, C)
        return f.reshape(-1, f.shape[-1])

    key = jax.random.PRNGKey(seed)
    for idx in range(len(dataset)):
        item = dataset.get_prototype_item(idx, num_frames)
        pts = features(jnp.asarray(item["imgs"]))
        key, sub = jax.random.split(key)
        centers, _ = kmeans(sub, pts, n_clusters, max_iter)
        out = os.path.join(save_dir, item["video"])
        os.makedirs(out, exist_ok=True)
        np.save(os.path.join(out, "centers.npy"), np.asarray(centers, np.float32))


class ClusterStore:
    """Per-video centre lookup with host-RAM memoisation."""

    def __init__(self, save_dir: str, n_clusters: int = 100, subset_ratio: float = 0.8,
                 seed: int = 0):
        self.save_dir = save_dir
        self.n_clusters = n_clusters
        self.subset_ratio = subset_ratio
        self._rng = np.random.RandomState(seed)
        self._cache: dict[str, np.ndarray] = {}

    def __call__(self, video: str) -> np.ndarray:  # (n_clusters, C)
        if video in self._cache:
            return self._cache[video]
        single = os.path.join(self.save_dir, video, "centers.npy")
        if os.path.isfile(single):
            centers = np.load(single)
        else:
            paths = sorted(glob.glob(os.path.join(self.save_dir, video, "*.npy")))
            if not paths:
                raise FileNotFoundError(f"no prototypes for video {video!r} in {self.save_dir}")
            centers = np.concatenate([np.load(p) for p in paths], axis=0)
            keep = int(centers.shape[0] * self.subset_ratio)
            idx = self._rng.permutation(centers.shape[0])[:keep]
            centers = centers[idx]
        if centers.shape[0] != self.n_clusters:
            # static-shape normalisation: sample with replacement if short
            idx = self._rng.choice(centers.shape[0], self.n_clusters,
                                   replace=centers.shape[0] < self.n_clusters)
            centers = centers[idx]
        self._cache[video] = centers.astype(np.float32)
        return self._cache[video]

    def batch(self, videos: list[str]) -> np.ndarray:  # (B, n_clusters, C)
        return np.stack([self(v) for v in videos])
