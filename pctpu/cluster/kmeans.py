"""K-Means — restores the reference's lost `KMeans.py` (SURVEY.md C7: the
file is missing upstream; the interface is fixed by
`Cluster_KMeans_GMM/compare_cluster.py:16,105`: `K_Means(n_clusters)`,
`.fit(X)`, `.predict(X)` / `.labels_`).

Jittable Lloyd iterations: assignment is a [N,k] distance matrix argmin (MXU),
update is a segment-sum — one fused XLA program for the whole fit.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("k", "max_iter"))
def kmeans(data: jax.Array, k: int, key: Optional[jax.Array] = None,
           max_iter: int = 100, tol: float = 1e-4,
           mask: Optional[jax.Array] = None):
    """data [N,D] -> (centers [k,D], labels [N], n_iter).

    k-means++-style farthest-first seeding (deterministic given key), Lloyd
    updates, convergence on center movement < tol.
    """
    n, d = data.shape
    if key is None:
        key = jax.random.PRNGKey(0)
    if mask is None:
        mask = jnp.ones((n,), bool)
    maskf = mask.astype(jnp.float32)
    big = jnp.float32(1e30)

    # seeding: first = random valid point; rest = farthest-first
    p0 = jax.random.categorical(key, jnp.where(mask, 0.0, -1e9))
    centers0 = jnp.zeros((k, d), data.dtype).at[0].set(data[p0])

    def seed_body(i, carry):
        centers, mind = carry
        dd = jnp.sum((data - centers[i - 1]) ** 2, axis=-1)
        mind = jnp.minimum(mind, dd)
        nxt = jnp.argmax(jnp.where(mask, mind, -big))
        return centers.at[i].set(data[nxt]), mind

    centers0, _ = jax.lax.fori_loop(
        1, k, seed_body, (centers0, jnp.full((n,), big)))

    def assign(centers):
        d2 = (jnp.sum(data * data, axis=1, keepdims=True)
              + jnp.sum(centers * centers, axis=1)[None, :]
              - 2.0 * jnp.matmul(data, centers.T,
                                 precision=jax.lax.Precision.HIGHEST))
        return jnp.argmin(d2, axis=1)

    def body(state):
        centers, _, it, _ = state
        labels = assign(centers)
        sums = jax.ops.segment_sum(data * maskf[:, None],
                                   labels, num_segments=k)
        cnts = jax.ops.segment_sum(maskf, labels, num_segments=k)
        new_centers = jnp.where(cnts[:, None] > 0,
                                sums / jnp.maximum(cnts, 1.0)[:, None],
                                centers)
        shift = jnp.max(jnp.sum((new_centers - centers) ** 2, axis=1))
        return new_centers, labels, it + 1, shift

    def cond(state):
        _, _, it, shift = state
        return (it < max_iter) & (shift > tol * tol)

    init = (centers0, jnp.zeros((n,), jnp.int32), jnp.int32(0), big)
    centers, _, n_iter, _ = jax.lax.while_loop(cond, body, init)
    return centers, assign(centers), n_iter


class K_Means:
    """Reference-interface shim (`compare_cluster.py:105`)."""

    def __init__(self, n_clusters: int, max_iter: int = 100, tol: float = 1e-4,
                 seed: int = 0):
        self.n_clusters = n_clusters
        self.max_iter = max_iter
        self.tol = tol
        self.seed = seed
        self.cluster_centers_ = None
        self.labels_ = None

    def fit(self, X):
        centers, labels, _ = kmeans(
            jnp.asarray(np.asarray(X, np.float32)), self.n_clusters,
            key=jax.random.PRNGKey(self.seed), max_iter=self.max_iter,
            tol=self.tol)
        self.cluster_centers_ = np.asarray(centers)
        self.labels_ = np.asarray(labels)
        return self

    def predict(self, X):
        X = np.asarray(X, np.float32)
        d2 = ((X[:, None, :] - self.cluster_centers_[None]) ** 2).sum(-1)
        return d2.argmin(1)
