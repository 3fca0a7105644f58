"""Tests for the parity extras: .dat readers, template API shims,
cluster-compare harness, CLI override parsing."""
import numpy as np
import jax.numpy as jnp

from pctpu.core import io, se3


def test_read_freiburg_dat(tmp_path, rng):
    rows = rng.normal(size=(40, 7)).astype(np.float32)
    path = tmp_path / "scan.dat"
    np.savetxt(path, rows)
    pts = io.read_freiburg_dat(str(path))
    np.testing.assert_allclose(pts, rows[:, 3:6], rtol=1e-5)
    sub = io.read_freiburg_dat(str(path), max_points=10)
    assert sub.shape == (10, 3)


def test_read_csv_points(tmp_path, rng):
    rows = rng.normal(size=(25, 3)).astype(np.float32)
    path = tmp_path / "cloud.txt"
    np.savetxt(path, rows, delimiter=",")
    pts = io.read_csv_points(str(path))
    np.testing.assert_allclose(pts, rows, rtol=1e-5)


def test_template_api_icp(rng):
    from scipy.spatial.transform import Rotation
    from pctpu.register import template_api as tpl
    src = rng.uniform(-5, 5, size=(800, 3)).astype(np.float32)
    R = Rotation.from_rotvec([0.03, 0.02, 0.08]).as_matrix().astype(np.float32)
    t = np.array([0.3, -0.2, 0.1], np.float32)
    dst = src @ R.T + t
    T = tpl.ICP(src.T, dst.T, max_iteration=50)
    np.testing.assert_allclose(T[:3, :3], R, atol=1e-3)
    np.testing.assert_allclose(T[:3, 3], t, atol=1e-2)

    # procrustes shim
    R2, t2 = tpl.procrustes_transformation(src.T, dst.T)
    np.testing.assert_allclose(R2, R, atol=1e-4)

    # associations shim
    pairs = tpl.find_associations(src.T, dst.T, dist_thresh=10.0)
    assert pairs.shape[0] == 2 and pairs.shape[1] == 800

    # matchings shim: identical features match identically
    feats = rng.normal(size=(33, 100)).astype(np.float32)
    m = tpl.find_matchings(feats, feats)
    np.testing.assert_array_equal(m[0], m[1])


def test_template_ransac_init(rng):
    from scipy.spatial.transform import Rotation
    from pctpu.register import template_api as tpl
    src = rng.uniform(-10, 10, size=(200, 3)).astype(np.float32)
    R = Rotation.from_rotvec([0.1, -0.3, 0.8]).as_matrix().astype(np.float32)
    t = np.array([4.0, 1.0, -2.0], np.float32)
    dst = src @ R.T + t
    matchings = np.stack([np.arange(200), np.arange(200)])
    T = tpl.ransac_init(src.T, dst.T, matchings, dist_thresh=0.5)
    rte, rre = se3.pose_diff_rte_rre(
        jnp.asarray(T), jnp.asarray(se3.make_transform(
            jnp.asarray(R), jnp.asarray(t))))
    assert float(rte) < 0.1 and float(rre) < 1.0


def test_cluster_compare_ours_only():
    from pctpu.pipelines.cluster_compare import run_comparison
    res = run_comparison(n_samples=200, include_sklearn=False)
    assert len(res) == 6
    # blobs is easy: every algorithm separates it well
    blob = res["blobs"]
    for name, e in blob.items():
        assert e["time_s"] > 0
        if "ari" in e and name in ("pctpu_KMeans", "pctpu_GMM"):
            assert e["ari"] > 0.9, (name, e["ari"])


def test_cli_override_parsing():
    from pctpu.nn.train_cli import parse_overrides, PRESETS
    kv = parse_overrides(["task=cls", "lr=0.01", "batch_size=4"])
    assert kv == {"task": "cls", "lr": "0.01", "batch_size": "4"}
    assert ("kitti", "msg") in PRESETS
