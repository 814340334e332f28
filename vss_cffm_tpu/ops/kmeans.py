"""Jittable k-means (Lloyd, euclidean) for CFFM++ prototype generation.

Replaces ``fast_pytorch_kmeans.KMeans(n_clusters=100, max_iter=10,
mode='euclidean')`` (reference ``cffm_head.py:276-284``): centroids
initialised from randomly chosen points, fixed 10 Lloyd iterations — a
``lax.scan`` of two dense matmuls (distance argmin + masked mean), entirely
on-device and MXU-shaped. Empty clusters keep their previous centroid.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["kmeans"]


@functools.partial(jax.jit, static_argnums=(2, 3))
def kmeans(
    rng: jax.Array,
    points: jnp.ndarray,  # (N, D)
    n_clusters: int = 100,
    max_iter: int = 10,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (centroids (K, D), labels (N,))."""
    n = points.shape[0]
    points = points.astype(jnp.float32)
    init_idx = jax.random.choice(rng, n, (n_clusters,), replace=False)
    init = points[init_idx]

    sq_p = jnp.sum(points * points, axis=1, keepdims=True)  # (N, 1)

    def assign(centroids):
        # argmin over ||p - c||^2 = ||p||^2 - 2 p·c + ||c||^2
        sq_c = jnp.sum(centroids * centroids, axis=1)  # (K,)
        d = sq_p - 2.0 * points @ centroids.T + sq_c[None, :]
        return jnp.argmin(d, axis=1)

    def step(centroids, _):
        labels = assign(centroids)
        onehot = jax.nn.one_hot(labels, n_clusters, dtype=jnp.float32)  # (N, K)
        counts = onehot.sum(0)  # (K,)
        sums = onehot.T @ points  # (K, D)
        new = jnp.where(counts[:, None] > 0, sums / jnp.maximum(counts[:, None], 1.0), centroids)
        return new, None

    centroids, _ = jax.lax.scan(step, init, None, length=max_iter)
    return centroids, assign(centroids)
