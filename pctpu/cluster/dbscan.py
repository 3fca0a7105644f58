"""DBSCAN as bounded-iteration label propagation.

The reference's stack-BFS expansion (`Cluster_dbscan/dbscan.py:10-37`) is
frontier-sequential — hostile to XLA. Equivalent TPU formulation
(SURVEY.md §7 "hard parts"): compute the radius neighbor graph once (tiled
distances), mark core points (|N_eps| >= min_pts, self included, matching
scipy query_ball_point semantics), then find connected components of the
core-core graph by iterated min-label propagation + pointer jumping inside a
`lax.while_loop`. Border points take the min core neighbor's label; the rest
are noise (-1). Labels are then compacted to 0..k-1.

Identical partitions to the standard algorithm; label numbering differs from
the reference's discovery order (compare partitions, not ids).
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from pctpu.ops.knn import radius_search

INT_BIG = jnp.int32(2**31 - 1)


@partial(jax.jit, static_argnames=("k_cap", "max_rounds"))
def dbscan(data: jax.Array, eps: float, min_pts: int,
           mask: Optional[jax.Array] = None,
           k_cap: int = 64, max_rounds: int = 64):
    """data [N,D<=3] -> labels [N] int32 (-1 = noise).

    k_cap bounds the neighbor list per point. Core-point detection is EXACT
    (count is uncapped), but label propagation runs over each point's k_cap
    NEAREST neighbors — a k-NN subgraph of the eps-graph. For natural data
    this subgraph is connected wherever the eps-graph is; adversarially
    dense balls (>> k_cap points clumped at separated poles of one eps-ball)
    can disconnect it. Use `dbscan_exact` for a truncation-proof escalating
    wrapper, or raise k_cap.
    """
    n = data.shape[0]
    if mask is None:
        mask = jnp.ones((n,), bool)

    res = radius_search(data, data, eps, k_cap, db_mask=mask)
    core = (res.count >= min_pts) & mask
    nbr_core = core[res.idx] & res.valid               # [N,K] core neighbors

    lab0 = jnp.where(core, jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0],
                     INT_BIG)

    def cond(state):
        lab, changed, it = state
        return changed & (it < max_rounds)

    def body(state):
        lab, _, it = state
        nlab = jnp.where(nbr_core, lab[res.idx], INT_BIG)
        m = jnp.min(nlab, axis=1)
        new = jnp.where(core, jnp.minimum(lab, m), lab)
        # pointer jumping: label -> label of that label's root (2 hops)
        safe = jnp.where(new == INT_BIG, 0, new)
        hop = jnp.where(new == INT_BIG, new, jnp.take(new, safe))
        hop = jnp.where(hop == INT_BIG, new, hop)
        changed = jnp.any(hop != lab)
        return hop, changed, it + 1

    lab, _, _ = jax.lax.while_loop(cond, body, (lab0, jnp.bool_(True),
                                                jnp.int32(0)))

    # border points: nearest core neighbor's label
    border_lab = jnp.min(jnp.where(nbr_core, lab[res.idx], INT_BIG), axis=1)
    lab = jnp.where(core, lab, border_lab)
    lab = jnp.where(mask, lab, INT_BIG)

    # compact root ids to 0..k-1 in root order
    is_root = (lab == jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0])
    new_id = jnp.cumsum(is_root.astype(jnp.int32)) - 1
    compact = jnp.where(lab == INT_BIG, -1,
                        jnp.take(new_id, jnp.where(lab == INT_BIG, 0, lab)))
    return compact


@partial(jax.jit, static_argnames=("k_cap",))
def _max_radius_count(data: jax.Array, eps: float,
                      mask: Optional[jax.Array], k_cap: int) -> jax.Array:
    if mask is None:
        mask = jnp.ones((data.shape[0],), bool)
    res = radius_search(data, data, eps, k_cap, db_mask=mask)
    return jnp.max(jnp.where(mask, res.count, 0))


def dbscan_exact(data, eps: float, min_pts: int, mask=None,
                 k_cap: int = 64, max_rounds: int = 64):
    """Host-level escalating DBSCAN: doubles k_cap until no eps-ball
    truncates (count <= k_cap) or k_cap covers the whole cloud.

    The jitted `dbscan` propagates labels over each point's k_cap NEAREST
    neighbors; in adversarially dense data (two hyper-dense poles inside one
    eps-ball) that k-NN subgraph can disconnect a true cluster. Escalation
    restores exactness at the cost of recompilation per k_cap step — use
    this at the application layer (the DBSCAN shim does); keep `dbscan` with
    a generous k_cap inside fully-jitted pipelines.
    """
    n = data.shape[0]
    data = jnp.asarray(data)
    while True:
        overflow = int(_max_radius_count(data, eps, mask, k_cap))
        if overflow <= k_cap or k_cap >= n:
            return dbscan(data, eps, min_pts, mask=mask,
                          k_cap=min(k_cap, n), max_rounds=max_rounds)
        k_cap = min(max(2 * k_cap, overflow), n)


class DBSCAN:
    """Reference-interface shim (`Cluster_dbscan/dbscan.py:4-39`).

    Uses the escalating exact path: truncation-proof for dense clouds."""

    def __init__(self, radius: float = 0.5, Min_Pts: int = 10,
                 k_cap: int = 64):
        self.radius = radius
        self.Min_Pts = Min_Pts
        self.k_cap = k_cap
        self.labels_ = None

    def fit(self, data):
        import numpy as np
        self.labels_ = np.asarray(dbscan_exact(
            jnp.asarray(np.asarray(data, np.float32)), self.radius,
            self.Min_Pts, k_cap=self.k_cap))
        return self

    def predict(self):
        return self.labels_
