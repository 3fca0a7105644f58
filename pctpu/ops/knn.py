"""k-NN and radius search — the capability the reference serves with KD-trees
and octrees (`Kdtree_Octree/lesson2/{kdtree,octree}.py`), recast for TPU.

Pointer-chasing trees are hostile to XLA; dense tiled distance + top-k uses
the MXU at full tilt and, for the cloud sizes in play (1e4-1e5 points), beats
tree traversal wall-clock by orders of magnitude (see bench.py). For bigger
clouds `pctpu.ops.grid_hash` provides the bucketed O(N) path.

API parity (SURVEY.md C3-C5): results carry explicit (idx, valid) masks, the
static-shape analogue of KNNResultSet/RadiusNNResultSet.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from pctpu.ops.pairwise import BIG, pairwise_sqdist


class NeighborSet(NamedTuple):
    """Static-shape neighbor result: the reference's result_set.py analogue.

    idx:   [M, K] int32 neighbor indices into the db
    dist2: [M, K] f32 squared distances (BIG where invalid)
    valid: [M, K] bool
    count: [M] int32 number of true neighbors found (may exceed K for radius
           search — an overflow counter, `RadiusNNResultSet.count` analogue)
    """
    idx: jax.Array
    dist2: jax.Array
    valid: jax.Array
    count: jax.Array


def _chunk_queries(query, query_chunk):
    m = query.shape[0]
    pad = (-m) % query_chunk
    q = jnp.pad(query, ((0, pad), (0, 0)), constant_values=0.0)
    return q.reshape(-1, query_chunk, query.shape[-1]), m


@partial(jax.jit, static_argnames=("k", "query_chunk", "db_chunk"))
def knn(query: jax.Array, db: jax.Array, k: int,
        db_mask: Optional[jax.Array] = None,
        query_chunk: int = 1024,
        db_chunk: Optional[int] = None) -> NeighborSet:
    """Exact k nearest neighbors, brute force, double-tiled.

    query [M,3], db [N,3] -> NeighborSet with K=k, sorted by distance asc.
    """
    n = db.shape[0]
    qs, m = _chunk_queries(query, query_chunk)

    if db_chunk is None or db_chunk >= n:
        if k <= 4:
            # iterative argmin extraction: k sequential (argmin + mask)
            # passes beat lax.top_k's sort-based lowering on TPU for tiny
            # k (three_nn at [4096q x 1024db] measured 20.4 -> ~2 ms).
            # Ties resolve to the lowest index, same as top_k.
            def one_chunk(qc):
                d2 = pairwise_sqdist(qc, db, db_mask)
                cols = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
                ds, is_ = [], []
                for _ in range(k):
                    i = jnp.argmin(d2, axis=1).astype(jnp.int32)
                    d = jnp.min(d2, axis=1)
                    ds.append(d)
                    is_.append(i)
                    d2 = jnp.where(cols == i[:, None], BIG, d2)
                return jnp.stack(ds, axis=1), jnp.stack(is_, axis=1)
        else:
            def one_chunk(qc):
                d2 = pairwise_sqdist(qc, db, db_mask)
                neg, idx = jax.lax.top_k(-d2, k)
                return -neg, idx.astype(jnp.int32)
        d2, idx = jax.lax.map(one_chunk, qs)
    else:
        pad_n = (-n) % db_chunk
        dbp = jnp.pad(db, ((0, pad_n), (0, 0)))
        maskp = (jnp.ones((n + pad_n,), bool) if db_mask is None
                 else jnp.pad(db_mask, (0, pad_n)))
        maskp = maskp.at[n:].set(False) if pad_n else maskp
        dbt = dbp.reshape(-1, db_chunk, 3)
        maskt = maskp.reshape(-1, db_chunk)
        n_tiles = dbt.shape[0]

        def one_chunk(qc):
            def body(t, carry):
                best_d, best_i = carry
                d2 = pairwise_sqdist(qc, dbt[t], maskt[t])
                base = (t * db_chunk).astype(jnp.int32)
                cat_d = jnp.concatenate([best_d, d2], axis=1)
                ids = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1) + base
                cat_i = jnp.concatenate([best_i, ids], axis=1)
                neg, sel = jax.lax.top_k(-cat_d, k)
                return -neg, jnp.take_along_axis(cat_i, sel, axis=1)

            init = (jnp.full((qc.shape[0], k), BIG),
                    jnp.zeros((qc.shape[0], k), jnp.int32))
            return jax.lax.fori_loop(0, n_tiles, body, init)

        d2, idx = jax.lax.map(one_chunk, qs)

    d2 = d2.reshape(-1, k)[:m]
    idx = idx.reshape(-1, k)[:m]
    valid = d2 < BIG
    count = jnp.sum(valid, axis=1).astype(jnp.int32)
    return NeighborSet(idx, d2, valid, count)


@partial(jax.jit, static_argnames=("k_cap", "query_chunk"))
def radius_search(query: jax.Array, db: jax.Array, radius: float,
                  k_cap: int,
                  db_mask: Optional[jax.Array] = None,
                  query_chunk: int = 1024) -> NeighborSet:
    """All neighbors within `radius`, capped at k_cap per query (closest
    k_cap kept), plus the uncapped per-query count as overflow telemetry.

    The reference's RadiusNNResultSet is unbounded (`result_set.py:62-93`);
    static shapes force the cap — `count` exposes any truncation
    (SURVEY.md §7: implicit truncations become explicit config).
    """
    r2 = jnp.float32(radius) ** 2
    qs, m = _chunk_queries(query, query_chunk)

    def one_chunk(qc):
        d2 = pairwise_sqdist(qc, db, db_mask)
        within = d2 <= r2
        cnt = jnp.sum(within, axis=1).astype(jnp.int32)
        d2m = jnp.where(within, d2, BIG)
        neg, idx = jax.lax.top_k(-d2m, k_cap)
        return -neg, idx.astype(jnp.int32), cnt

    d2, idx, cnt = jax.lax.map(one_chunk, qs)
    d2 = d2.reshape(-1, k_cap)[:m]
    idx = idx.reshape(-1, k_cap)[:m]
    cnt = cnt.reshape(-1)[:m]
    valid = d2 < BIG
    return NeighborSet(idx, d2, valid, cnt)


def nearest(query: jax.Array, db: jax.Array,
            db_mask: Optional[jax.Array] = None,
            query_chunk: int = 2048,
            backend: str = "auto"):
    """1-NN: (dist2 [M], idx [M]). The ICP association primitive.

    backend: 'pallas' (fused VMEM-resident kernel, TPU only), 'xla'
    (portable tiled fallback), or 'auto' (pallas on TPU, xla elsewhere).
    """
    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    if backend == "pallas":
        from pctpu.ops.pallas_nn import nearest_pallas
        return nearest_pallas(query, db, db_mask)
    from pctpu.ops.pairwise import chunked_min_argmin
    return chunked_min_argmin(query, db, db_mask, query_chunk)
