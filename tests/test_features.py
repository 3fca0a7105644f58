import numpy as np
import jax
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from pctpu import features


def make_box_cloud(rng, n_per_face=200, size=2.0, noise=0.01):
    """Points on the surface of a box — corners are the salient features."""
    faces = []
    for axis in range(3):
        for side in (-1.0, 1.0):
            p = rng.uniform(-size / 2, size / 2, (n_per_face, 3))
            p[:, axis] = side * size / 2
            faces.append(p)
    pts = np.concatenate(faces).astype(np.float32)
    return pts + rng.normal(scale=noise, size=pts.shape).astype(np.float32)


def test_iss_finds_corners(rng):
    pts = make_box_cloud(rng)
    res = features.iss_keypoints(
        jnp.asarray(pts), salient_radius=0.5, non_max_radius=0.4,
        gamma_21=0.8, gamma_32=0.8, min_neighbors=5, k_cap=96)
    keep = np.asarray(res.keypoint_mask)
    assert keep.sum() >= 4  # some corners/edges detected
    # keypoints lie near corners/edges, not face centers: nearest-corner
    # distance must stay below the face-center distance (sqrt(2) for this box)
    kp = pts[keep]
    corners = np.array([[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1)
                        for sz in (-1, 1)], np.float32)
    d = np.linalg.norm(kp[:, None, :] - corners[None], axis=-1).min(1)
    assert np.median(d) < 1.0


def test_iss_nms_separation(rng):
    pts = make_box_cloud(rng)
    res = features.iss_keypoints(
        jnp.asarray(pts), salient_radius=0.5, non_max_radius=0.5,
        gamma_21=0.8, gamma_32=0.8, k_cap=96)
    kp = pts[np.asarray(res.keypoint_mask)]
    if kp.shape[0] > 1:
        d = np.linalg.norm(kp[:, None] - kp[None], axis=-1)
        np.fill_diagonal(d, np.inf)
        assert d.min() > 0.35  # NMS enforces separation (approx radius)


def test_iss_max_keypoints(rng):
    pts = make_box_cloud(rng)
    res = features.iss_keypoints(
        jnp.asarray(pts), salient_radius=0.5, non_max_radius=0.2,
        gamma_21=0.9, gamma_32=0.9, k_cap=96, max_keypoints=5)
    assert np.asarray(res.keypoint_mask).sum() <= 5


def test_harris_response_on_box(rng):
    pts = make_box_cloud(rng)
    res = features.harris3d_keypoints(jnp.asarray(pts), radius=0.4,
                                      threshold=1e-4, k_cap=96)
    keep = np.asarray(res.keypoint_mask)
    resp = np.asarray(res.response)
    assert np.all(np.isfinite(resp))
    # flat-face interior points must have near-zero response
    center_face = np.abs(pts[:, 0] - 1.0) < 0.02
    interior = center_face & (np.abs(pts[:, 1]) < 0.5) & (np.abs(pts[:, 2]) < 0.5)
    if interior.sum() > 5:
        assert np.median(resp[interior]) < np.percentile(resp, 95)
    assert keep.sum() >= 1


def test_fpfh_invariance_and_discrimination(rng):
    pts = make_box_cloud(rng, noise=0.005)
    f1 = np.asarray(features.fpfh(jnp.asarray(pts), radius=0.5, k_cap=64,
                                  normal_k=12))
    assert f1.shape == (pts.shape[0], 33)
    # each 11-bin block sums to ~100
    blocks = f1.reshape(-1, 3, 11).sum(-1)
    np.testing.assert_allclose(blocks, 100.0, atol=1e-3)

    # rotation invariance: descriptors computed on a rotated copy match
    R = Rotation.from_rotvec([0.4, 0.2, -0.3]).as_matrix().astype(np.float32)
    f2 = np.asarray(features.fpfh(jnp.asarray(pts @ R.T), radius=0.5,
                                  k_cap=64, normal_k=12))
    err = np.linalg.norm(f1 - f2, axis=1) / np.maximum(
        np.linalg.norm(f1, axis=1), 1e-6)
    assert np.median(err) < 0.25  # invariant up to normal-sign flips/noise


def test_match_features_mutual(rng):
    pts = make_box_cloud(rng, noise=0.003)
    n = pts.shape[0]
    f = np.asarray(features.fpfh(jnp.asarray(pts), radius=0.5, k_cap=64,
                                 normal_k=12))
    # permuted copy of the same descriptors must match back exactly
    perm = rng.permutation(n)
    matches = features.match_features(jnp.asarray(f), jnp.asarray(f[perm]))
    got = perm[np.asarray(matches.dst_idx)]
    valid = np.asarray(matches.valid)
    assert valid.mean() > 0.7
    assert (got[valid] == np.arange(n)[valid]).mean() > 0.95


def test_radius_nms_basic():
    pts = jnp.asarray(np.array([[0, 0, 0], [0.1, 0, 0], [5, 0, 0]],
                               np.float32))
    scores = jnp.asarray(np.array([1.0, 2.0, 0.5], np.float32))
    cand = jnp.ones((3,), bool)
    keep = np.asarray(features.radius_nms(pts, scores, cand, radius=1.0,
                                          k_cap=3))
    assert list(keep) == [False, True, True]


def test_shot352_shape_and_invariance(rng):
    from scipy.spatial.transform import Rotation
    # generic (fully 3-D) cloud: neighborhood covariances have distinct
    # eigenvalues, so the LRF is well-defined (on symmetric flat patches the
    # x-axis is inherently ambiguous — same as PCL)
    pts = rng.normal(size=(1200, 3)).astype(np.float32)
    pts *= np.array([1.0, 0.6, 0.3], np.float32)
    kp = pts[rng.choice(pts.shape[0], 20, replace=False)]
    f1 = np.asarray(features.shot352(jnp.asarray(pts), jnp.asarray(kp),
                                     radius=0.6, k_cap=96, normal_k=12))
    assert f1.shape == (20, 352)
    norms = np.linalg.norm(f1, axis=1)
    np.testing.assert_allclose(norms[norms > 0], 1.0, atol=1e-5)
    # rotation invariance (LRF-based): same descriptors on rotated copy
    R = Rotation.from_rotvec([0.3, -0.2, 0.5]).as_matrix().astype(np.float32)
    f2 = np.asarray(features.shot352(jnp.asarray(pts @ R.T),
                                     jnp.asarray(kp @ R.T),
                                     radius=0.6, k_cap=96, normal_k=12))
    cos = np.sum(f1 * f2, axis=1)
    assert np.median(cos) > 0.8


def test_sift3d_finds_density_structure(rng):
    # a dense blob inside a sparse background: the blob is a density extremum
    bg = rng.uniform(-2, 2, size=(600, 3)).astype(np.float32)
    blob = (rng.normal(scale=0.05, size=(200, 3)) +
            np.array([1.0, 1.0, 0.0])).astype(np.float32)
    pts = np.concatenate([bg, blob])
    res = features.sift3d_keypoints(jnp.asarray(pts), min_scale=0.1,
                                    n_octaves=2, scales_per_octave=2,
                                    min_contrast=0.5, k_cap=96)
    keep = np.asarray(res.keypoint_mask)
    assert keep.sum() >= 1
    kp = pts[keep]
    # at least one keypoint near the blob center
    d = np.linalg.norm(kp - np.array([1.0, 1.0, 0.0]), axis=1)
    assert d.min() < 0.5


def test_harris6d(rng):
    pts = make_box_cloud(rng)
    # intensity with a sharp spatial edge adds appearance corners
    intensity = (pts[:, 0] > 0).astype(np.float32)
    res = features.harris6d_keypoints(jnp.asarray(pts),
                                      jnp.asarray(intensity),
                                      radius=0.4, threshold=1e-5, k_cap=96)
    assert np.all(np.isfinite(np.asarray(res.response)))
    assert np.asarray(res.keypoint_mask).sum() >= 1
