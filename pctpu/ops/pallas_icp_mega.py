"""Whole-loop fused ICP: EVERY fixed iteration inside ONE Pallas kernel.

The round-2/3 fused kernels (`pallas_banded.icp_moments_banded[_v2]`)
reduced each ICP iteration to one Pallas call plus a 3x3 solve — but the
measured per-iteration cost stayed ~0.5 ms on a 16k-point cloud, an order
of magnitude above the window compute: it is dispatch + per-call fixed
latency, paid `iters` times. This kernel pays it ONCE.

Grid = (iters, ntiles), sequential on TPU. Per step: transform the query
tile by the CURRENT pose (12 scalars in SMEM scratch), pick the banded db
window from the LUT, compute windowed 1-NN + the weighted-Procrustes
moment matrix (exactly the `_moments_kernel_v2` math), and accumulate it
into a VMEM scratch. At each iteration's LAST tile the kernel solves the
3x3 Procrustes problem entirely in scalar registers — Higham-scaled
Newton polar iteration with cofactor inverse-transpose, reflection
corrected by flipping along the least-eigenvector of S = Up^T H (adjugate
column extraction), matching `register.procrustes.rotation_polar3` — and
updates the pose scratch for the next iteration. XLA sees one kernel for
the whole loop; there is NO per-iteration glue at all.

Exactness knob: `window_blocks >= Np/block` degenerates the band to the
full db (the offset clips to 0), i.e. exact brute-force association —
that is the bench's polish phase, same kernel.

Reference anchor: the ICP hot loop this replaces is
`Registration/main.py:107-154` (per-point Python KDTreeFlann queries +
NumPy SVD per iteration).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pctpu.ops.pallas_banded import LUT_BINS, BandedDB

BIG = 1e30


# ---------------------------------------------------------------------------
# scalar-register 3x3 linear algebra (tuples of scalars, fully unrolled)
# ---------------------------------------------------------------------------

def _s_cross(a, b):
    return (a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0])


def _s_dot(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _s_fro2(M):
    return sum(M[i][j] * M[i][j] for i in range(3) for j in range(3))


def _s_matmul(A, B):
    return tuple(tuple(sum(A[i][k] * B[k][j] for k in range(3))
                       for j in range(3)) for i in range(3))


def _s_matvec(A, v):
    return tuple(sum(A[i][k] * v[k] for k in range(3)) for i in range(3))


def _s_inv_transpose(X):
    """X^{-T} rows are cross products of the other two rows over det
    (scalar form of `procrustes._inv_transpose3`)."""
    c0 = _s_cross(X[1], X[2])
    c1 = _s_cross(X[2], X[0])
    c2 = _s_cross(X[0], X[1])
    det = _s_dot(X[0], c0)
    safe = jnp.where(jnp.abs(det) > 1e-30, det, jnp.float32(1e-30))
    inv = 1.0 / safe
    return (tuple(c * inv for c in c0),
            tuple(c * inv for c in c1),
            tuple(c * inv for c in c2)), det


def _s_rotation_polar3(H, newton_iters: int = 6):
    """Scalar-register transcription of `register.procrustes.rotation_polar3`
    (Higham-scaled Newton polar + adjugate flip for det<0). H: 3x3 tuple of
    scalars; returns 3x3 tuple of scalars (a proper rotation)."""
    fn = jnp.sqrt(jnp.maximum(_s_fro2(H), 1e-30))
    X = tuple(tuple(h / fn for h in row) for row in H)
    Hn = X  # normalized H, reused for the S = Up^T H correction

    for _ in range(newton_iters):
        Xit, _ = _s_inv_transpose(X)
        g = jnp.sqrt(jnp.sqrt(
            _s_fro2(Xit) / jnp.maximum(_s_fro2(X), 1e-30)))
        gi = 0.5 / g
        gh = 0.5 * g
        X = tuple(tuple(gh * X[i][j] + gi * Xit[i][j] for j in range(3))
                  for i in range(3))

    # det(Up) sign decides the reflection correction
    d = _s_dot(X[0], _s_cross(X[1], X[2]))

    # S = Up^T Hn symmetrized: SPD = V diag(s) V^T; its least eigenvector is
    # the smallest-singular direction of H
    S = tuple(tuple(sum(X[k][i] * Hn[k][j] for k in range(3))
                    for j in range(3)) for i in range(3))
    S = tuple(tuple(0.5 * (S[i][j] + S[j][i]) for j in range(3))
              for i in range(3))

    # smallest eigenvalue of the (SPD) 3x3 S: Newton on the characteristic
    # cubic f(x) = x^3 - a x^2 + b x - c from x=0 — below the least root f
    # is concave increasing, so Newton converges monotonically from below
    # (no acos: Pallas TPU has no inverse-trig lowering)
    a = S[0][0] + S[1][1] + S[2][2]
    b = (S[0][0] * S[1][1] - S[0][1] ** 2 + S[0][0] * S[2][2]
         - S[0][2] ** 2 + S[1][1] * S[2][2] - S[1][2] ** 2)
    c = _s_dot(S[0], _s_cross(S[1], S[2]))
    lam_min = jnp.float32(0.0)
    for _ in range(12):
        f = ((lam_min - a) * lam_min + b) * lam_min - c
        fp = (3.0 * lam_min - 2.0 * a) * lam_min + b
        fp = jnp.where(jnp.abs(fp) > 1e-30, fp, jnp.float32(1e-30))
        lam_min = lam_min - f / fp

    # adj(S - lam_min I) is rank-1 with columns parallel to the least
    # eigenvector; take the largest-norm cofactor row (symmetric => = column)
    B2 = tuple(tuple(S[i][j] - (lam_min if i == j else 0.0)
                     for j in range(3)) for i in range(3))
    a0 = _s_cross(B2[1], B2[2])
    a1 = _s_cross(B2[2], B2[0])
    a2 = _s_cross(B2[0], B2[1])
    n0 = _s_dot(a0, a0)
    n1 = _s_dot(a1, a1)
    n2 = _s_dot(a2, a2)
    use0 = (n0 >= n1) & (n0 >= n2)
    use1 = n1 >= n2
    v = tuple(jnp.where(use0, a0[i], jnp.where(use1, a1[i], a2[i]))
              for i in range(3))
    vn = jnp.sqrt(jnp.maximum(_s_dot(v, v), 1e-30))
    v = tuple(c / vn for c in v)

    # R = where(d < 0, Up (I - 2 v v^T), Up)
    Uf = tuple(tuple(X[i][j] - 2.0 * _s_dot(X[i], v) * v[j]
                     for j in range(3)) for i in range(3))
    neg = d < 0
    return tuple(tuple(jnp.where(neg, Uf[i][j], X[i][j]) for j in range(3))
                 for i in range(3))


def _s_procrustes_from_moments(m, newton_iters: int = 6):
    """(R, t) from 16 moment scalars m[a][b] = sum w [p;1]_a [q;1]_b
    (scalar form of `register.procrustes.procrustes_from_moments`,
    solver='polar')."""
    sw = jnp.maximum(m[3][3], 1e-12)
    inv_sw = 1.0 / sw
    sp = (m[0][3], m[1][3], m[2][3])          # sum w p
    sq = (m[3][0], m[3][1], m[3][2])          # sum w q
    # H = sum w q p^T - sq sp^T / sw;  H[i][j] = m[j][i] - sq_i sp_j / sw
    H = tuple(tuple(m[j][i] - sq[i] * sp[j] * inv_sw for j in range(3))
              for i in range(3))
    R = _s_rotation_polar3(H, newton_iters=newton_iters)
    src_c = tuple(c * inv_sw for c in sp)
    dst_c = tuple(c * inv_sw for c in sq)
    Rs = _s_matvec(R, src_c)
    t = tuple(dst_c[i] - Rs[i] for i in range(3))
    return R, t


# ---------------------------------------------------------------------------
# the mega kernel
# ---------------------------------------------------------------------------

def _mega_body(k, i, ntiles, niters, scal_ref, lut_ref, cent_ref, src_ref,
               spen_ref, dbt_ref, out_ref, m44_ref, pose_ref, *,
               block: int, window_blocks: int, thresh2: float,
               query_tile: int, nb: int, newton_iters: int):
    """Shared body of the mega kernel: one (iteration k, query tile i)
    grid step. `niters` = total ICP iterations in this launch.

    dbt_ref is the [5, Np] packed db: rows x,y,z, pen2 (=|b|^2 + mask
    penalty), ones. Folding pen2 into the db lets the distance partial
    d2 = pen2 - 2 b.q come out of ONE K=4 matmul — a [Np,1] side input
    would pad its lane dim 1 -> 128 in VMEM (8 MB at 16k points, 64 MB
    at full scan res) and sink the whole kernel's VMEM budget."""

    @pl.when((k == 0) & (i == 0))
    def _():
        for s in range(12):
            pose_ref[0, s] = scal_ref[0, s]

    @pl.when(i == 0)
    def _():
        m44_ref[:] = jnp.zeros_like(m44_ref)

    r00, r01, r02 = pose_ref[0, 0], pose_ref[0, 1], pose_ref[0, 2]
    r10, r11, r12 = pose_ref[0, 3], pose_ref[0, 4], pose_ref[0, 5]
    r20, r21, r22 = pose_ref[0, 6], pose_ref[0, 7], pose_ref[0, 8]
    t0, t1, t2 = pose_ref[0, 9], pose_ref[0, 10], pose_ref[0, 11]
    lo, hi, axf = scal_ref[0, 12], scal_ref[0, 13], scal_ref[0, 14]

    # window offset from the tile's TRANSFORMED center (scalar math)
    c0 = cent_ref[0, 3 * i]
    c1 = cent_ref[0, 3 * i + 1]
    c2 = cent_ref[0, 3 * i + 2]
    cx = r00 * c0 + r01 * c1 + r02 * c2 + t0
    cy = r10 * c0 + r11 * c1 + r12 * c2 + t1
    cz = r20 * c0 + r21 * c1 + r22 * c2 + t2
    val = jnp.where(axf < 0.5, cx, jnp.where(axf < 1.5, cy, cz))
    binf = (val - lo) / jnp.maximum(hi - lo, 1e-12) * LUT_BINS
    bin_ = jnp.clip(binf.astype(jnp.int32), 0, LUT_BINS)
    # center the window on the tile's sorted position (block-rounded):
    # pos - wb*blk/2 + blk/2 keeps the span symmetric for even wb too
    # (pos//blk - wb//2 left most of an even window BEHIND the query)
    pos = lut_ref[0, bin_]
    base = jnp.clip(
        (pos - (window_blocks * block) // 2 + block // 2) // block,
        0, nb - window_blocks)

    tq = query_tile
    q3 = src_ref[:, pl.ds(i * tq, tq)]                 # [3, TQ] source pts
    xt = r00 * q3[0:1] + r01 * q3[1:2] + r02 * q3[2:3] + t0
    yt = r10 * q3[0:1] + r11 * q3[1:2] + r12 * q3[2:3] + t1
    zt = r20 * q3[0:1] + r21 * q3[1:2] + r22 * q3[2:3] + t2
    qt3 = jnp.concatenate([xt, yt, zt], axis=0)        # [3, TQ] transformed
    qn = xt * xt + yt * yt + zt * zt                   # [1, TQ]
    qpen = spen_ref[0:1, pl.ds(i * tq, tq)]            # [1, TQ]
    ones = jnp.ones((1, tq), jnp.float32)
    qa = jnp.concatenate([-2.0 * qt3, ones], axis=0)   # [4, TQ]

    def body(j, carry):
        minv, macc = carry                             # [1,TQ], [4,TQ]
        start = (base + j) * block
        win5 = dbt_ref[:, pl.ds(start, block)]         # [5, blk]
        # d2 partial = pen2 - 2 b.q in one matmul: rows x,y,z,pen2 of the
        # packed db against [-2 q; 1]
        d2 = jax.lax.dot_general(
            win5[0:4, :], qa, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)        # [blk, TQ]
        tmin = jnp.min(d2, axis=0, keepdims=True)      # [1, TQ]
        sel = (d2 <= tmin).astype(jnp.float32)         # [blk, TQ]
        win4 = jnp.concatenate([win5[0:3, :], win5[4:5, :]], axis=0)
        ext = jax.lax.dot_general(
            win4, sel, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)        # [4, TQ] cx cy cz cnt
        better = tmin < minv
        return (jnp.where(better, tmin, minv),
                jnp.where(better, ext, macc))

    init = (jnp.full((1, tq), BIG),
            jnp.concatenate([jnp.zeros((3, tq), jnp.float32),
                             jnp.ones((1, tq), jnp.float32)], axis=0))
    minv, macc = jax.lax.fori_loop(0, window_blocks, body, init)

    cnt = jnp.maximum(macc[3:4, :], 1.0)
    matched = macc[0:3, :] / cnt                       # tie-averaged coords
    w = ((minv + qn + qpen) < jnp.float32(thresh2)).astype(jnp.float32)
    hp = jnp.concatenate([qt3, ones], axis=0) * w      # [4, TQ]
    hq = jnp.concatenate([matched, ones], axis=0)      # [4, TQ]
    m44 = jax.lax.dot_general(hp, hq, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    m44_ref[0:4, 0:4] = m44_ref[0:4, 0:4] + m44

    @pl.when(i == ntiles - 1)
    def _():
        # whole-iteration epilogue: scalar-register Procrustes solve and
        # pose compose — the only non-vector work in the entire ICP loop
        m = tuple(tuple(m44_ref[a, b] for b in range(4)) for a in range(4))
        R, t = _s_procrustes_from_moments(m, newton_iters=newton_iters)
        Told = ((r00, r01, r02), (r10, r11, r12), (r20, r21, r22))
        told = (t0, t1, t2)
        Rn = _s_matmul(R, Told)
        Rt = _s_matvec(R, told)
        tn = tuple(Rt[a] + t[a] for a in range(3))
        # degenerate-iteration guard: if the gate rejected (almost) every
        # correspondence the moment matrix is ~0 and the polar solve would
        # emit a garbage non-rotation; keep the previous pose instead.
        # Weights are 0/1 so m[3][3] counts correspondences; Procrustes
        # needs >= 3 non-degenerate points.
        ok = m[3][3] >= 3.0
        for a in range(3):
            for b in range(3):
                pose_ref[0, 3 * a + b] = jnp.where(
                    ok, Rn[a][b], Told[a][b])
            pose_ref[0, 9 + a] = jnp.where(ok, tn[a], told[a])

    @pl.when((k == niters - 1) & (i == ntiles - 1))
    def _():
        for s in range(12):
            out_ref[0, s] = pose_ref[0, s]
        out_ref[0, 12] = 0.0
        out_ref[0, 13] = 0.0
        out_ref[0, 14] = 0.0
        out_ref[0, 15] = 0.0


def _icp_mega_kernel(scal_ref, lut_ref, cent_ref, src_ref, spen_ref,
                     dbt_ref, out_ref, m44_ref, pose_ref, *,
                     block: int, window_blocks: int, thresh2: float,
                     query_tile: int, nb: int, newton_iters: int):
    _mega_body(pl.program_id(0), pl.program_id(1), pl.num_programs(1),
               pl.num_programs(0), scal_ref, lut_ref, cent_ref, src_ref,
               spen_ref, dbt_ref, out_ref, m44_ref, pose_ref,
               block=block, window_blocks=window_blocks, thresh2=thresh2,
               query_tile=query_tile, nb=nb, newton_iters=newton_iters)


def _icp_mega_kernel_batch(scal_ref, lut_ref, cent_ref, src_ref, spen_ref,
                           dbt_ref, out_ref, m44_ref, pose_ref, *,
                           block: int, window_blocks: int, thresh2: float,
                           query_tile: int, nb: int, newton_iters: int):
    """Batched variant: grid = (pairs, iters, ntiles); every ref is a
    per-pair block (leading batch dim squeezed by the BlockSpec)."""
    _mega_body(pl.program_id(1), pl.program_id(2), pl.num_programs(2),
               pl.num_programs(1), scal_ref, lut_ref, cent_ref, src_ref,
               spen_ref, dbt_ref, out_ref, m44_ref, pose_ref,
               block=block, window_blocks=window_blocks, thresh2=thresh2,
               query_tile=query_tile, nb=nb, newton_iters=newton_iters)


def pack_dbt5(bdb: BandedDB) -> jax.Array:
    """[5, Np] packed db for the mega kernels: rows x, y, z, pen2, ones."""
    return jnp.concatenate(
        [bdb.dbt, bdb.pen2, jnp.ones_like(bdb.pen2)], axis=0)


@partial(jax.jit, static_argnames=("iters", "dist_thresh", "block",
                                   "window_blocks", "query_tile",
                                   "interpret", "newton_iters"))
def icp_mega(bdb: BandedDB, src3: jax.Array,
             spen: jax.Array, centers: jax.Array, init_T: jax.Array,
             iters: int = 30, dist_thresh: float = 5.0,
             block: int = 512, window_blocks: int = 4,
             query_tile: int = 256, interpret: bool = False,
             newton_iters: int = 6) -> jax.Array:
    """Run `iters` full ICP iterations in ONE Pallas call; returns T [4,4].

    src3 [3, Mp]: SORTED source points (pre-transform, padded to a
    query_tile multiple); spen [1, Mp]: 0 valid / BIG pad; centers
    [1, 3*ntiles]: per-tile center source coords. Layout prep is once per
    ICP (see `register.icp.icp_fixed_iters_banded_mega`).
    """
    mp = src3.shape[1]
    nb = bdb.dbt4.shape[1] // block
    wb = min(window_blocks, nb)
    axf = bdb.axis.astype(jnp.float32)
    scal = jnp.concatenate([
        init_T[:3, :3].reshape(9), init_T[:3, 3], bdb.lo[None],
        bdb.hi[None], axf[None], jnp.zeros((1,), jnp.float32)]
    ).astype(jnp.float32).reshape(1, 16)
    dbt5 = pack_dbt5(bdb)

    mem = pl.ANY if interpret else pltpu.VMEM
    smem = pl.ANY if interpret else pltpu.SMEM
    out = pl.pallas_call(
        partial(_icp_mega_kernel, block=block, window_blocks=wb,
                thresh2=float(dist_thresh) ** 2, query_tile=query_tile,
                nb=nb, newton_iters=newton_iters),
        grid=(iters, mp // query_tile),
        in_specs=[
            pl.BlockSpec(memory_space=smem),   # scal
            pl.BlockSpec(memory_space=smem),   # lut
            pl.BlockSpec(memory_space=smem),   # centers
            pl.BlockSpec(memory_space=mem),    # src3
            pl.BlockSpec(memory_space=mem),    # spen
            pl.BlockSpec(memory_space=mem),    # dbt5
        ],
        out_specs=pl.BlockSpec(memory_space=smem),
        out_shape=jax.ShapeDtypeStruct((1, 16), jnp.float32),
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32),
                        pltpu.SMEM((1, 16), jnp.float32)],
        interpret=interpret,
    )(scal, bdb.lut[None, :], centers, src3, spen, dbt5)
    R = out[0, :9].reshape(3, 3)
    t = out[0, 9:12]
    T = jnp.eye(4, dtype=jnp.float32)
    return T.at[:3, :3].set(R).at[:3, 3].set(t)


@partial(jax.jit, static_argnames=("iters", "dist_thresh", "block",
                                   "window_blocks", "query_tile",
                                   "interpret", "newton_iters"))
def icp_mega_batch(dbt5: jax.Array, lut: jax.Array,
                   lo: jax.Array, hi: jax.Array, axis: jax.Array,
                   src3: jax.Array, spen: jax.Array, centers: jax.Array,
                   init_T: jax.Array,
                   iters: int = 30, dist_thresh: float = 5.0,
                   block: int = 512, window_blocks: int = 4,
                   query_tile: int = 256, interpret: bool = False,
                   newton_iters: int = 6) -> jax.Array:
    """Batched whole-loop ICP: grid = (B, iters, ntiles), one launch for a
    whole PAIR SWEEP. Unlike `jax.vmap(icp_mega)` — whose batching rule
    loads the entire [B,...] operands into VMEM and OOMs past ~8 x 16k
    points — every operand here is blocked per pair via its BlockSpec, so
    VMEM holds one pair's working set regardless of B.

    Per-pair layouts (leading B on everything):
      dbt5 [B,5,Np] packed db (x,y,z,pen2,ones), lut [B,1,LUT_BINS+1],
      lo/hi [B] band-axis range, axis [B] int sort axis, src3 [B,3,Mp],
      spen [B,1,Mp], centers [B,1,3*ntiles], init_T [B,4,4].
    Returns [B,4,4].
    """
    bsz, _, mp = src3.shape
    axf = axis.astype(jnp.float32)
    scal = jnp.concatenate([
        init_T[:, :3, :3].reshape(bsz, 9), init_T[:, :3, 3],
        lo[:, None], hi[:, None], axf[:, None],
        jnp.zeros((bsz, 1), jnp.float32)],
        axis=1).astype(jnp.float32).reshape(bsz, 1, 16)
    np_ = dbt5.shape[2]
    nb = np_ // block
    wb = min(window_blocks, nb)
    ntiles = mp // query_tile

    mem = pl.ANY if interpret else pltpu.VMEM
    smem = pl.ANY if interpret else pltpu.SMEM

    def bspec(shape, space):
        return pl.BlockSpec((None,) + shape, lambda b, k, i: (b,) + (0,) * len(shape),
                            memory_space=space)

    out = pl.pallas_call(
        partial(_icp_mega_kernel_batch, block=block, window_blocks=wb,
                thresh2=float(dist_thresh) ** 2, query_tile=query_tile,
                nb=nb, newton_iters=newton_iters),
        grid=(bsz, iters, ntiles),
        in_specs=[
            bspec((1, 16), smem),                  # scal
            bspec((1, lut.shape[2]), smem),        # lut
            bspec((1, 3 * ntiles), smem),          # centers
            bspec((3, mp), mem),                   # src3
            bspec((1, mp), mem),                   # spen
            bspec((5, np_), mem),                  # dbt5
        ],
        out_specs=bspec((1, 16), smem),
        out_shape=jax.ShapeDtypeStruct((bsz, 1, 16), jnp.float32),
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32),
                        pltpu.SMEM((1, 16), jnp.float32)],
        interpret=interpret,
    )(scal, lut, centers, src3, spen, dbt5)
    R = out[:, 0, :9].reshape(bsz, 3, 3)
    t = out[:, 0, 9:12]
    T = jnp.tile(jnp.eye(4, dtype=jnp.float32), (bsz, 1, 1))
    return T.at[:, :3, :3].set(R).at[:, :3, 3].set(t)
