import numpy as np
import jax.numpy as jnp

from pctpu.utils import viz, Timer, time_fn


def test_write_clusters_ply(tmp_path, rng):
    pts = rng.normal(size=(50, 3)).astype(np.float32)
    labels = rng.integers(-1, 3, size=50)
    p = tmp_path / "c.ply"
    viz.write_clusters_ply(str(p), pts, labels)
    assert "element vertex 50" in p.read_text()


def test_write_registration_ply(tmp_path, rng):
    src = rng.normal(size=(20, 3)).astype(np.float32)
    dst = rng.normal(size=(30, 3)).astype(np.float32)
    T = np.eye(4)
    p = tmp_path / "r.ply"
    viz.write_registration_ply(str(p), src, dst, T)
    assert "element vertex 50" in p.read_text()


def test_write_detections_and_trajectory(tmp_path, rng):
    pts = rng.normal(size=(40, 3)).astype(np.float32)
    boxes = [{"center": [0, 0, 0], "dims": [2, 1, 1], "R": None,
              "class_id": 0}]
    p = tmp_path / "d.ply"
    viz.write_detections_ply(str(p), pts, boxes)
    text = p.read_text()
    assert "element vertex" in text
    poses = np.tile(np.eye(4), (5, 1, 1))
    poses[:, 0, 3] = np.arange(5)
    p2 = tmp_path / "t.ply"
    viz.write_trajectory_ply(str(p2), poses)
    assert "element vertex 5" in p2.read_text()


def test_timer_and_time_fn():
    t = Timer()
    with t.section("a"):
        pass
    with t.section("a"):
        pass
    assert t.counts["a"] == 2
    assert "a:" in t.report()

    out = time_fn(lambda x: jnp.sum(x), jnp.ones((128,)), warmup=1, reps=2)
    assert out["mean_s"] >= 0


def test_measure_mfu_matmul():
    """MFU helper: XLA's FLOP count for a matmul is ~2MNK and MFU lands in
    (0, 1] against an explicit peak."""
    import jax.numpy as jnp
    from pctpu.utils.profiling import flops_of, measure_mfu, mfu

    a = jnp.ones((256, 128), jnp.float32)
    b = jnp.ones((128, 64), jnp.float32)
    f = lambda x, y: x @ y
    fl = flops_of(f, a, b)
    assert abs(fl - 2 * 256 * 128 * 64) / (2 * 256 * 128 * 64) < 0.2
    out = measure_mfu(f, a, b, reps=2)
    assert out["flops"] == fl and out["mean_s"] > 0
    assert 0 < mfu(fl, 1.0, peak=1e12) < 1
