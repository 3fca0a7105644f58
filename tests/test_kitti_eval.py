import numpy as np
import pytest

from pctpu.pipelines import kitti_eval as KE


def make_box(cls="Car", x=0.0, z=10.0, ry=0.0, h=1.5, w=1.7, l=4.0,
             score=-1.0, bbox_h=50.0):
    return KE.Box(type=cls, truncated=0.0, occluded=0,
                  bbox=np.array([100.0, 100.0, 180.0, 100.0 + bbox_h]),
                  dims=np.array([h, w, l]), loc=np.array([x, 1.6, z]),
                  ry=ry, score=score)


def test_bev_iou_identical():
    a = make_box()
    assert KE.bev_iou(a, a) == pytest.approx(1.0, abs=1e-6)
    assert KE.iou3d(a, a) == pytest.approx(1.0, abs=1e-6)


def test_bev_iou_disjoint_and_half():
    a = make_box(x=0.0)
    b = make_box(x=100.0)
    assert KE.bev_iou(a, b) == 0.0
    # shift by half the width in z: overlap = (w/2 * l) -> IoU = 1/3
    c = make_box(x=0.0)
    c.loc = c.loc + np.array([0.0, 0.0, c.dims[1] / 2])
    assert KE.bev_iou(a, c) == pytest.approx(1.0 / 3.0, abs=1e-3)


def test_bev_iou_rotation_aware():
    a = make_box(w=1.0, l=4.0)
    b = make_box(w=1.0, l=4.0, ry=np.pi / 2)
    # two crossed 1x4 rectangles: intersection 1x1 -> IoU = 1/7
    assert KE.bev_iou(a, b) == pytest.approx(1.0 / 7.0, abs=1e-3)


def test_iou3d_height_overlap():
    a = make_box()
    b = make_box()
    b.loc = b.loc + np.array([0.0, a.dims[0] / 2, 0.0])  # half-height shift
    assert KE.iou3d(a, b) == pytest.approx(1.0 / 3.0, abs=1e-3)


def write_label(path, boxes, with_score=False):
    with open(path, "w") as f:
        for b in boxes:
            row = [b.type, f"{b.truncated}", f"{b.occluded}", "-10",
                   *(f"{v:.2f}" for v in b.bbox),
                   *(f"{v:.2f}" for v in b.dims),
                   *(f"{v:.2f}" for v in b.loc), f"{b.ry:.2f}"]
            if with_score:
                row.append(f"{b.score:.2f}")
            f.write(" ".join(row) + "\n")


def test_ap_perfect_and_degraded(tmp_path):
    rng = np.random.default_rng(0)
    gt_files, det_files = [], []
    for fi in range(6):
        gts = [make_box(x=float(5 * i), z=10.0 + 3 * i) for i in range(3)]
        dets_perfect = [KE.Box(**{**vars(g), "score": 90.0}) for g in gts]
        gp = tmp_path / f"gt_{fi}.txt"
        dp = tmp_path / f"det_{fi}.txt"
        write_label(gp, gts)
        write_label(dp, dets_perfect, with_score=True)
        gt_files.append(str(gp))
        det_files.append(str(dp))

    res = KE.evaluate_detections(gt_files, det_files, classes=("Car",),
                                 metric="bev")
    assert res["Car"]["easy"] == pytest.approx(1.0, abs=1e-6)
    assert res["Car"]["moderate"] == pytest.approx(1.0, abs=1e-6)

    # drop 1/3 of detections (the highest-x one per frame)
    det_files2 = []
    for fi in range(6):
        gts = KE.parse_label_file(gt_files[fi])
        keep = [KE.Box(**{**vars(g), "score": 90.0}) for g in gts[:2]]
        dp = tmp_path / f"det2_{fi}.txt"
        write_label(dp, keep, with_score=True)
        det_files2.append(str(dp))
    res2 = KE.evaluate_detections(gt_files, det_files2, classes=("Car",),
                                  metric="bev")
    assert 0.5 < res2["Car"]["easy"] < 0.75  # recall caps at 2/3

    # false positives lower AP below the perfect score
    det_files3 = []
    for fi in range(6):
        gts = KE.parse_label_file(gt_files[fi])
        dets = [KE.Box(**{**vars(g), "score": 90.0}) for g in gts]
        fp = make_box(x=50.0, z=40.0, score=95.0)  # high-scoring FP
        dets.append(fp)
        dp = tmp_path / f"det3_{fi}.txt"
        write_label(dp, dets, with_score=True)
        det_files3.append(str(dp))
    res3 = KE.evaluate_detections(gt_files, det_files3, classes=("Car",),
                                  metric="bev")
    assert res3["Car"]["easy"] < 1.0


def test_difficulty_bins(tmp_path):
    # a GT with small bbox height counts only for moderate/hard
    gt = [make_box(bbox_h=30.0)]
    det = [KE.Box(**{**vars(gt[0]), "score": 90.0})]
    gp, dp = tmp_path / "g.txt", tmp_path / "d.txt"
    write_label(gp, gt)
    write_label(dp, det, with_score=True)
    res = KE.evaluate_detections([str(gp)], [str(dp)], classes=("Car",))
    assert np.isnan(res["Car"]["easy"])  # no easy GT
    assert res["Car"]["moderate"] == pytest.approx(1.0, abs=1e-6)
