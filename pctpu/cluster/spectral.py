"""Spectral clustering (kNN affinity graph -> Laplacian -> embedding -> KMeans).

Parity with `Cluster_KMeans_GMM/spectral_clustering.py:7-46`: W[i,j] =
W[j,i] = 1/dist over the kNN graph (self excluded), L = D - W, optionally
normalized D^-1 L; bottom-k eigenvectors; KMeans on the embedding. The
Python per-point graph loop becomes one kNN call + a scatter; the
eigendecomposition uses the symmetric normalized Laplacian
D^-1/2 L D^-1/2 (same eigenstructure as the reference's D^-1 L — similar
matrices — but lets us use `eigh` instead of a general `eig`, which is what
the reference's TODO about complex eigenvectors was fighting).
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from pctpu.ops.knn import knn
from pctpu.cluster.kmeans import kmeans


@partial(jax.jit, static_argnames=("n_clusters", "nnk", "normalized"))
def spectral_embedding(data: jax.Array, n_clusters: int, nnk: int = 7,
                       normalized: bool = True) -> jax.Array:
    """data [N,D] -> embedding [N, n_clusters] (bottom eigenvectors)."""
    n = data.shape[0]
    res = knn(data, data, nnk + 1)                 # includes self
    rows = jax.lax.broadcasted_iota(jnp.int32, res.idx.shape, 0)
    w = 1.0 / jnp.sqrt(jnp.maximum(res.dist2, 1e-20))
    not_self = res.idx != rows
    w = jnp.where(not_self, w, 0.0)
    W = jnp.zeros((n, n), jnp.float32)
    W = W.at[rows.reshape(-1), res.idx.reshape(-1)].max(w.reshape(-1))
    W = jnp.maximum(W, W.T)                        # symmetrize
    deg = jnp.sum(W, axis=1)
    if normalized:
        dinv = jax.lax.rsqrt(jnp.maximum(deg, 1e-12))
        L = jnp.eye(n) - (dinv[:, None] * W) * dinv[None, :]
    else:
        L = jnp.diag(deg) - W
    eigvals, eigvecs = jnp.linalg.eigh(L)          # ascending
    return eigvecs[:, :n_clusters]


def spectral_clustering(data: jax.Array, n_clusters: int, nnk: int = 7,
                        normalized: bool = True,
                        key: Optional[jax.Array] = None) -> jax.Array:
    emb = spectral_embedding(data, n_clusters, nnk, normalized)
    _, labels, _ = kmeans(emb, n_clusters, key=key)
    return labels


class spetral_clustering:  # sic — the reference's class name, kept for parity
    """Reference-interface shim (`spectral_clustering.py:7-46`)."""

    def __init__(self, n_clusters: int = 2, nnk: int = 7,
                 normalized: bool = True, seed: int = 0):
        self.n_clusters = n_clusters
        self.nnk_ = nnk
        self.normalized_ = normalized
        self.seed = seed
        self.labels_ = np.empty(0)

    def fit(self, data):
        self.labels_ = np.asarray(spectral_clustering(
            jnp.asarray(np.asarray(data, np.float32)), self.n_clusters,
            self.nnk_, self.normalized_, key=jax.random.PRNGKey(self.seed)))
        return self

    def predict(self):
        return self.labels_
