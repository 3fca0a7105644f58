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


def test_neighbor_class_not_penalized(tmp_path):
    """Official protocol: a Car detection matching a Van GT is neither TP
    nor FP (NEIGHBOR_CLASSES); same for Pedestrian vs Person_sitting."""
    gt_car = make_box(x=0.0)
    gt_van = make_box(cls="Van", x=20.0)
    gts = [gt_car, gt_van]
    # detections: one on the Car, one (higher score) exactly on the Van
    d1 = KE.Box(**{**vars(gt_car), "score": 90.0})
    d2 = KE.Box(**{**vars(gt_van), "type": "Car", "score": 95.0})
    gp, dp = tmp_path / "g.txt", tmp_path / "d.txt"
    write_label(gp, gts)
    write_label(dp, [d1, d2], with_score=True)
    res = KE.evaluate_detections([str(gp)], [str(dp)], classes=("Car",),
                                 metric="bev")
    # without neighbor handling the Van-matched det would be a
    # higher-scoring FP and easy AP would drop below 1
    assert res["Car"]["easy"] == pytest.approx(1.0, abs=1e-6)


def test_dontcare_region_not_penalized(tmp_path):
    """A detection inside a DontCare region (intersection / det area >=
    threshold) is neither TP nor FP."""
    gt_car = make_box(x=0.0)
    dc = KE.Box(type="DontCare", truncated=-1.0, occluded=-1,
                bbox=np.array([300.0, 50.0, 500.0, 250.0]),
                dims=np.array([-1.0, -1.0, -1.0]),
                loc=np.array([-1000.0, -1000.0, -1000.0]), ry=-10.0)
    d1 = KE.Box(**{**vars(gt_car), "score": 90.0})
    d2 = make_box(x=60.0, z=50.0, score=95.0)           # far from the GT
    d2.bbox = np.array([350.0, 100.0, 420.0, 150.0])    # inside DontCare
    gp, dp = tmp_path / "g.txt", tmp_path / "d.txt"
    write_label(gp, [gt_car, dc])
    write_label(dp, [d1, d2], with_score=True)
    res = KE.evaluate_detections([str(gp)], [str(dp)], classes=("Car",),
                                 metric="bev")
    assert res["Car"]["easy"] == pytest.approx(1.0, abs=1e-6)
    # same detection OUTSIDE the DontCare region IS a false positive
    d2.bbox = np.array([600.0, 100.0, 680.0, 150.0])
    write_label(dp, [d1, d2], with_score=True)
    res = KE.evaluate_detections([str(gp)], [str(dp)], classes=("Car",),
                                 metric="bev")
    assert res["Car"]["easy"] < 1.0


def test_small_detection_ignored_at_easy(tmp_path):
    """An unmatched detection shorter than the difficulty's min bbox height
    is ignored (it could never match a valid GT at that difficulty)."""
    gt_car = make_box(x=0.0)            # bbox_h=50 -> easy-valid
    d1 = KE.Box(**{**vars(gt_car), "score": 90.0})
    d_small = make_box(x=60.0, z=50.0, score=95.0, bbox_h=30.0)  # h=30 px
    gp, dp = tmp_path / "g.txt", tmp_path / "d.txt"
    write_label(gp, [gt_car])
    write_label(dp, [d1, d_small], with_score=True)
    res = KE.evaluate_detections([str(gp)], [str(dp)], classes=("Car",))
    assert res["Car"]["easy"] == pytest.approx(1.0, abs=1e-6)   # ignored
    assert res["Car"]["moderate"] < 1.0                          # real FP


def test_ap_r40_hand_computed(tmp_path):
    """2 GT; detections (score desc): TP, FP, TP ->
    PR points (r=.5,p=1), (r=.5,p=.5), (r=1,p=2/3);
    R40 AP = (20*1 + 20*(2/3)) / 40 = 5/6."""
    g1 = make_box(x=0.0)
    g2 = make_box(x=20.0)
    d1 = KE.Box(**{**vars(g1), "score": 3.0})
    d_fp = make_box(x=60.0, z=50.0, score=2.0)
    d2 = KE.Box(**{**vars(g2), "score": 1.0})
    gp, dp = tmp_path / "g.txt", tmp_path / "d.txt"
    write_label(gp, [g1, g2])
    write_label(dp, [d1, d_fp, d2], with_score=True)
    res = KE.evaluate_detections([str(gp)], [str(dp)], classes=("Car",),
                                 metric="bev")
    assert res["Car"]["easy"] == pytest.approx(5.0 / 6.0, abs=1e-6)
