
import numpy as np
import jax.numpy as jnp

from pctpu.core.cloud import PointCloud
from pctpu.core import io, se3


def test_pointcloud_padding(rng):
    pts = rng.normal(size=(1000, 3)).astype(np.float32)
    pc = PointCloud.from_numpy(pts)
    assert pc.capacity == 1024
    assert int(pc.count()) == 1000
    np.testing.assert_array_equal(pc.to_numpy(), pts)
    # padded points are copies of point 0 (finite)
    assert np.all(np.isfinite(np.asarray(pc.points)))


def test_pointcloud_transform(rng):
    pts = rng.normal(size=(100, 3)).astype(np.float32)
    pc = PointCloud.from_numpy(pts)
    from scipy.spatial.transform import Rotation
    R = Rotation.random(random_state=0).as_matrix().astype(np.float32)
    t = np.array([1.0, -2.0, 0.5], np.float32)
    T = se3.make_transform(jnp.asarray(R), jnp.asarray(t))
    out = pc.transform(T)
    np.testing.assert_allclose(out.to_numpy(), pts @ R.T + t, atol=1e-5)


def test_read_velodyne_bin(tmp_path, rng):
    data = rng.normal(size=(50, 4)).astype(np.float32)
    p = tmp_path / "scan.bin"
    data.tofile(p)
    pts = io.read_velodyne_bin(str(p))
    np.testing.assert_array_equal(pts, data[:, :3])
    full = io.read_velodyne_bin(str(p), return_intensity=True)
    np.testing.assert_array_equal(full, data)


def test_read_oxford_bin(tmp_path, rng):
    data = rng.normal(size=(30, 6)).astype(np.float32)
    p = tmp_path / "0.bin"
    data.tofile(p)
    pts, normals = io.read_oxford_bin(str(p))
    np.testing.assert_array_equal(pts, data[:, :3])
    np.testing.assert_array_equal(normals, data[:, 3:])


def test_real_kitti_scan(kitti_scan):
    assert kitti_scan.shape == (124668, 3)
    assert kitti_scan.dtype == np.float32


def test_kitti_calib_roundtrip(tmp_path):
    content = (
        "P2: " + " ".join(str(float(i)) for i in range(12)) + "\n"
        "R0_rect: " + " ".join(str(float(i)) for i in range(9)) + "\n"
        "Tr_velo_to_cam: " + " ".join(str(float(i)) for i in range(12)) + "\n"
    )
    p = tmp_path / "calib.txt"
    p.write_text(content)
    calib = io.read_kitti_calib(str(p))
    assert calib["P2"].shape == (3, 4)
    assert calib["R0_rect"].shape == (3, 3)
    assert calib["Tr_velo_to_cam"].shape == (3, 4)


def test_kitti_label_parse_and_velo(tmp_path):
    line = "Car 0.0 0 1.5 100 100 200 200 1.5 1.6 3.8 2.0 1.0 10.0 0.1\n"
    bad = "DontCare -1 -1 -10 0 0 0 0 -1 -1 -1 -1000 -1000 -1000 -10\n"
    p = tmp_path / "label.txt"
    p.write_text(line + bad)
    objs = io.read_kitti_label(str(p))
    assert len(objs) == 1  # negative-dimension row filtered
    o = objs[0]
    assert o["type"] == "Car"
    assert o["radius"] > 0
    calib = {
        "R0_rect": np.eye(3),
        "Tr_velo_to_cam": np.hstack([np.eye(3), np.zeros((3, 1))]),
    }
    io.kitti_labels_to_velo(objs, calib)
    # identity calib: velo center == cam center + height/2 lift on z
    assert o["vx"] == 2.0 and o["vy"] == 1.0
    assert o["vz"] == 10.0 + 1.5 / 2


def test_reg_results_roundtrip(tmp_path):
    rows = [(0, 456, np.array([1.0, 2.0, 3.0]), np.array([1.0, 0.0, 0.0, 0.0]))]
    p = tmp_path / "reg_result.txt"
    io.write_reg_results(str(p), rows)
    back = io.read_reg_results(str(p))
    assert back[0][0] == "idx1"
    assert back[1][0] == "0" and back[1][1] == "456"
    assert float(back[1][2]) == 1.0


def test_write_ply(tmp_path, rng):
    pts = rng.normal(size=(10, 3)).astype(np.float32)
    p = tmp_path / "cloud.ply"
    io.write_ply(str(p), pts, colors=np.tile([1.0, 0.0, 0.0], (10, 1)))
    text = p.read_text()
    assert "element vertex 10" in text
    assert text.count("\n") >= 20
