import numpy as np

from pctpu import native


def test_native_builds():
    assert native.available(), "g++ build of fastio.cpp failed"


def test_batch_read_f32(tmp_path, rng):
    paths = []
    datas = []
    for i in range(10):
        d = rng.normal(size=(100 + i * 7,)).astype(np.float32)
        p = tmp_path / f"f{i}.bin"
        d.tofile(p)
        paths.append(str(p))
        datas.append(d)
    paths.append(str(tmp_path / "missing.bin"))
    arena, counts = native.batch_read_f32(paths, 1024, n_threads=4)
    for i, d in enumerate(datas):
        assert counts[i] == d.size
        np.testing.assert_array_equal(arena[i, : d.size], d)
    assert counts[-1] == -1


def test_batch_read_velodyne(tmp_path, rng):
    scans = []
    paths = []
    for i in range(4):
        s = rng.normal(size=(50 + i, 4)).astype(np.float32)
        p = tmp_path / f"{i:06d}.bin"
        s.tofile(p)
        scans.append(s)
        paths.append(str(p))
    out = native.batch_read_velodyne(paths, max_points=1000, n_threads=2)
    for s, o in zip(scans, out):
        np.testing.assert_array_equal(o, s[:, :3])


def test_batch_read_real_scan(kitti_scan, tmp_path):
    from tests.conftest import REFERENCE_KITTI_BIN
    out = native.batch_read_velodyne([REFERENCE_KITTI_BIN])
    np.testing.assert_array_equal(out[0], kitti_scan)


def test_voxel_count_matches_python(rng):
    pts = rng.uniform(0, 5, size=(2000, 3)).astype(np.float32)
    got = native.voxel_count(pts, 0.5)
    mn = pts.min(axis=0)
    cells = np.floor((pts - mn) / 0.5).astype(np.int64)
    ref = len({tuple(c) for c in cells})
    assert got == ref

