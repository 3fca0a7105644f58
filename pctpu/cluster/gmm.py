"""Full-covariance Gaussian-mixture EM.

Capability parity with `Cluster_KMeans_GMM/GMM.py:13-70` (E-step
responsibilities, batched-outer-product M-step, NLL early stop tol=1e-3,
max_iter=50) — but numerically hardened: log-space responsibilities via
Cholesky factors + logsumexp instead of the reference's raw pdf products
(which underflow), and a covariance jitter floor. The whole EM loop is one
jitted `lax.while_loop`.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.lax import Precision as _P
import numpy as np


class GMMState(NamedTuple):
    means: jax.Array    # [k, D]
    covs: jax.Array     # [k, D, D]
    weights: jax.Array  # [k]
    nll: jax.Array      # scalar
    n_iter: jax.Array


def _log_gaussian(data, mean, cov, jitter):
    """log N(data | mean, cov) for one component: data [N,D] -> [N]."""
    d = data.shape[1]
    L = jnp.linalg.cholesky(cov + jitter * jnp.eye(d, dtype=cov.dtype))
    diff = data - mean
    # solve L y = diff^T  ->  mahalanobis = |y|^2
    y = jax.scipy.linalg.solve_triangular(L, diff.T, lower=True)
    maha = jnp.sum(y * y, axis=0)
    logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(L)))
    return -0.5 * (maha + logdet + d * jnp.log(2.0 * jnp.pi))


def _e_step(data, means, covs, weights, jitter):
    logp = jax.vmap(lambda m, c: _log_gaussian(data, m, c, jitter))(
        means, covs)                                   # [k, N]
    logw = jnp.log(jnp.maximum(weights, 1e-30))[:, None]
    joint = logp + logw
    lse = jax.scipy.special.logsumexp(joint, axis=0)   # [N]
    gamma = jnp.exp(joint - lse[None, :])              # [k, N]
    nll = -jnp.sum(lse)
    return gamma, nll


@partial(jax.jit, static_argnames=("k", "max_iter"))
def gmm_fit(data: jax.Array, k: int, key: Optional[jax.Array] = None,
            max_iter: int = 50, tol: float = 1e-3,
            jitter: float = 1e-6) -> GMMState:
    """EM fit. data [N,D] -> GMMState. Reference loop semantics: stop when
    last_nll - nll < tol (GMM.py:60-62)."""
    n, d = data.shape
    if key is None:
        key = jax.random.PRNGKey(0)
    # init from k-means centers (more robust than the reference's
    # uniform-random-in-unit-cube init), identity covs, uniform weights
    from pctpu.cluster.kmeans import kmeans
    means0, _, _ = kmeans(data, k, key=key)
    covs0 = jnp.tile(jnp.eye(d, dtype=data.dtype), (k, 1, 1))
    weights0 = jnp.full((k,), 1.0 / k, data.dtype)

    def m_step(gamma):
        nk = jnp.sum(gamma, axis=1)                    # [k]
        nk_safe = jnp.maximum(nk, 1e-10)
        means = (gamma @ data) / nk_safe[:, None]
        diff = data[None, :, :] - means[:, None, :]    # [k,N,D]
        wdiff = diff * gamma[:, :, None]
        covs = jnp.einsum("kni,knj->kij", wdiff, diff,
                          precision=_P.HIGHEST) / nk_safe[:, None, None]
        weights = nk / n
        return means, covs, weights

    def cond(state):
        prev_nll, st = state
        return (st.n_iter < max_iter) & (prev_nll - st.nll >= tol)

    def body(state):
        _, st = state
        gamma, _ = _e_step(data, st.means, st.covs, st.weights, jitter)
        means, covs, weights = m_step(gamma)
        _, nll = _e_step(data, means, covs, weights, jitter)
        return st.nll, GMMState(means, covs, weights, nll, st.n_iter + 1)

    gamma, nll0 = _e_step(data, means0, covs0, weights0, jitter)
    init = (jnp.float32(jnp.inf),
            GMMState(means0, covs0, weights0, nll0, jnp.int32(0)))
    _, final = jax.lax.while_loop(cond, body, init)
    return final


@partial(jax.jit, static_argnames=())
def gmm_predict(state: GMMState, data: jax.Array,
                jitter: float = 1e-6) -> jax.Array:
    gamma, _ = _e_step(data, state.means, state.covs, state.weights, jitter)
    return jnp.argmax(gamma, axis=0)


class GMM:
    """Reference-interface shim (`GMM.py:13-70`)."""

    def __init__(self, n_clusters: int, max_iter: int = 50, tol: float = 1e-3,
                 seed: int = 0):
        self.n_clusters = n_clusters
        self.max_iter = max_iter
        self.tol = tol
        self.seed = seed
        self.state: Optional[GMMState] = None

    def fit(self, data):
        self.state = gmm_fit(jnp.asarray(np.asarray(data, np.float32)),
                             self.n_clusters,
                             key=jax.random.PRNGKey(self.seed),
                             max_iter=self.max_iter, tol=self.tol)
        return self

    def predict(self, data):
        return np.asarray(gmm_predict(
            self.state, jnp.asarray(np.asarray(data, np.float32))))
