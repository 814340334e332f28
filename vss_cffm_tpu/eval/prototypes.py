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
and keeps a random 80% subset (``:444-452``), used *as-is* (variable count).
We reproduce that subset and zero-pad to a store-wide static ``pad_to`` with
a boolean validity mask — masked softmax over the valid rows is identical to
the reference's variable-count attention, whereas resampling duplicates
would skew attention weights. Shapes stay static under jit.
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
    """Per-video centre lookup with host-RAM memoisation.

    ``__call__`` returns ``(centers, mask)``: centres zero-padded to the
    store-wide static ``pad_to`` row count, plus a bool validity mask. For
    the common one-file-per-video layout this is exactly (n_clusters, C)
    with an all-true mask.
    """

    def __init__(self, save_dir: str, n_clusters: int = 100, subset_ratio: float = 0.8,
                 seed: int = 0):
        self.save_dir = save_dir
        self.n_clusters = n_clusters
        self.subset_ratio = subset_ratio
        self._rng = np.random.RandomState(seed)
        self._cache: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        self._pad_to: int | None = None

    @property
    def pad_to(self) -> int:
        """Static padded row count: max kept-centre count over all videos.

        Computed once from .npy headers (mmap, no data read) so every video's
        centres batch to one static shape.
        """
        if self._pad_to is None:
            best = self.n_clusters
            for vdir in sorted(glob.glob(os.path.join(self.save_dir, "*"))):
                paths = sorted(glob.glob(os.path.join(vdir, "*.npy")))
                if not paths:
                    continue
                rows = sum(np.load(p, mmap_mode="r").shape[0] for p in paths)
                kept = rows if len(paths) == 1 else int(rows * self.subset_ratio)
                best = max(best, kept)
            self._pad_to = best
        return self._pad_to

    def _load(self, video: str) -> np.ndarray:
        single = os.path.join(self.save_dir, video, "centers.npy")
        if os.path.isfile(single):
            return np.load(single)
        paths = sorted(glob.glob(os.path.join(self.save_dir, video, "*.npy")))
        if not paths:
            raise FileNotFoundError(f"no prototypes for video {video!r} in {self.save_dir}")
        # multiple files: concatenate + random 80% subset, used as-is
        # (reference ``cffm_head.py:444-452``)
        centers = np.concatenate([np.load(p) for p in paths], axis=0)
        keep = int(centers.shape[0] * self.subset_ratio)
        idx = self._rng.permutation(centers.shape[0])[:keep]
        return centers[idx]

    def __call__(self, video: str) -> tuple[np.ndarray, np.ndarray]:
        """(centers (pad_to, C) float32, mask (pad_to,) bool)."""
        if video in self._cache:
            return self._cache[video]
        centers = self._load(video).astype(np.float32)
        p = self.pad_to
        k = centers.shape[0]
        assert k <= p, f"video {video!r} has {k} centres > pad_to {p}"
        mask = np.zeros((p,), bool)
        mask[:k] = True
        if k < p:
            centers = np.concatenate(
                [centers, np.zeros((p - k, centers.shape[1]), np.float32)], axis=0
            )
        self._cache[video] = (centers, mask)
        return self._cache[video]

    def batch(self, videos: list[str]) -> tuple[np.ndarray, np.ndarray]:
        """((B, pad_to, C), (B, pad_to)) stacked centres + masks."""
        pairs = [self(v) for v in videos]
        return np.stack([p[0] for p in pairs]), np.stack([p[1] for p in pairs])
