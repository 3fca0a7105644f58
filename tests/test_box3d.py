"""Rotated-box ops vs the NumPy polygon-clip oracle.

The oracle is this repo's own KITTI evaluator geometry
(`pctpu.pipelines.kitti_eval._polygon_clip/_polygon_area`), itself validated
against hand-checked IoU values — serving the reference's library-parity
oracle pattern (SURVEY.md §4).
"""
import numpy as np
import pytest

from pctpu.ops import box3d
from pctpu.pipelines.kitti_eval import _polygon_clip, _polygon_area


def _np_bev_corners(box):
    cx, cy, _, dx, dy, _, yaw = box
    c, s = np.cos(yaw), np.sin(yaw)
    loc = np.array([[dx, dy], [-dx, dy], [-dx, -dy], [dx, -dy]]) * 0.5
    R = np.array([[c, -s], [s, c]])
    return loc @ R.T + np.array([cx, cy])


def _np_iou_bev(a, b):
    inter = _polygon_area(_polygon_clip(_np_bev_corners(a),
                                        _np_bev_corners(b)))
    ua = a[3] * a[4] + b[3] * b[4] - inter
    return inter / max(ua, 1e-9)


def _np_iou3d(a, b):
    inter_bev = _polygon_area(_polygon_clip(_np_bev_corners(a),
                                            _np_bev_corners(b)))
    ih = max(0.0, min(a[2] + a[5] / 2, b[2] + b[5] / 2)
             - max(a[2] - a[5] / 2, b[2] - b[5] / 2))
    inter = inter_bev * ih
    u = a[3] * a[4] * a[5] + b[3] * b[4] * b[5] - inter
    return inter / max(u, 1e-9)


def _random_boxes(rng, n):
    return np.column_stack([
        rng.uniform(-5, 5, (n, 2)),          # x, y
        rng.uniform(-1, 1, (n, 1)),          # z
        rng.uniform(0.5, 4.0, (n, 3)),       # dx, dy, dz
        rng.uniform(-np.pi, np.pi, (n, 1)),  # yaw
    ]).astype(np.float32)


def test_iou_bev_matches_oracle(rng):
    a = _random_boxes(rng, 24)
    b = _random_boxes(rng, 16)
    got = np.asarray(box3d.iou_bev(a, b))
    want = np.array([[_np_iou_bev(x, y) for y in b] for x in a])
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)


def test_iou3d_matches_oracle(rng):
    a = _random_boxes(rng, 16)
    b = _random_boxes(rng, 16)
    got = np.asarray(box3d.iou3d(a, b))
    want = np.array([[_np_iou3d(x, y) for y in b] for x in a])
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)


def test_iou_identity_and_disjoint():
    a = np.array([[0, 0, 0, 2, 4, 2, 0.3]], np.float32)
    far = np.array([[100, 0, 0, 2, 4, 2, 1.0]], np.float32)
    assert np.asarray(box3d.iou_bev(a, a))[0, 0] == pytest.approx(1.0, abs=1e-4)
    assert np.asarray(box3d.iou3d(a, a))[0, 0] == pytest.approx(1.0, abs=1e-4)
    assert np.asarray(box3d.iou_bev(a, far))[0, 0] == 0.0


def test_iou_axis_aligned_known():
    # unit squares overlapping by half: inter .5, union 1.5 -> 1/3
    a = np.array([[0, 0, 0, 1, 1, 1, 0.0]], np.float32)
    b = np.array([[0.5, 0, 0, 1, 1, 1, 0.0]], np.float32)
    assert np.asarray(box3d.iou_bev(a, b))[0, 0] == pytest.approx(1 / 3, abs=1e-4)


def test_nms_rotated():
    boxes = np.array([
        [0, 0, 0, 2, 2, 2, 0.0],     # best
        [0.1, 0, 0, 2, 2, 2, 0.05],  # near-duplicate, suppressed
        [10, 0, 0, 2, 2, 2, 0.0],    # far, kept
        [10.1, 0, 0, 2, 2, 2, 0.0],  # dup of the far one, suppressed
        [-10, 5, 0, 2, 2, 2, 1.0],   # kept
    ], np.float32)
    scores = np.array([0.9, 0.8, 0.7, 0.6, 0.5], np.float32)
    idx, valid = box3d.nms_rotated(boxes, scores, 0.5, max_out=5)
    idx, valid = np.asarray(idx), np.asarray(valid)
    assert valid.sum() == 3
    assert list(idx[valid]) == [0, 2, 4]  # descending score
    assert (idx[~valid] == -1).all()


def test_points_in_boxes_and_roipool(rng):
    pts = rng.uniform(-6, 6, (400, 3)).astype(np.float32)
    boxes = _random_boxes(rng, 8)
    inside = np.asarray(box3d.points_in_boxes(pts, boxes))
    # numpy oracle: transform into box frame
    for m, box in enumerate(boxes):
        rel = pts - box[:3]
        c, s = np.cos(box[6]), np.sin(box[6])
        lx = c * rel[:, 0] + s * rel[:, 1]
        ly = -s * rel[:, 0] + c * rel[:, 1]
        want = ((np.abs(lx) <= box[3] / 2) & (np.abs(ly) <= box[4] / 2)
                & (np.abs(rel[:, 2]) <= box[5] / 2))
        np.testing.assert_array_equal(inside[m], want)

    feats = rng.normal(size=(400, 5)).astype(np.float32)
    cap = 16
    xyz, pf, valid, count = box3d.roipool3d(pts, feats, boxes, cap=cap)
    xyz, pf = np.asarray(xyz), np.asarray(pf)
    valid, count = np.asarray(valid), np.asarray(count)
    np.testing.assert_array_equal(count, inside.sum(-1))
    np.testing.assert_array_equal(valid.sum(-1), np.minimum(count, cap))
    for m in range(8):
        first = np.flatnonzero(inside[m])[:cap]
        np.testing.assert_allclose(pf[m, : len(first)], feats[first],
                                   rtol=1e-6)
        # pooled xyz are in the box-local frame -> inside the extent box
        k = len(first)
        assert (np.abs(xyz[m, :k, 0]) <= boxes[m, 3] / 2 + 1e-4).all()
        assert (np.abs(xyz[m, :k, 2]) <= boxes[m, 5] / 2 + 1e-4).all()


def test_corners3d_shape():
    boxes = np.array([[1, 2, 3, 2, 4, 2, 0.5]], np.float32)
    c = np.asarray(box3d.corners3d(boxes))
    assert c.shape == (1, 8, 3)
    np.testing.assert_allclose(c[0, :4, 2], 2.0, atol=1e-6)  # bottom z
    np.testing.assert_allclose(c[0, 4:, 2], 4.0, atol=1e-6)  # top z
    np.testing.assert_allclose(c[0].mean(0), [1, 2, 3], atol=1e-5)


def test_nms_max_out_exceeds_candidates():
    """ADVICE r1: max_out > n_boxes must not crash top_k; pads invalid."""
    boxes = np.array([[0, 0, 0, 2, 2, 2, 0.0],
                      [10, 10, 0, 2, 2, 2, 0.0]], np.float32)
    scores = np.array([0.9, 0.8], np.float32)
    idx, valid = box3d.nms_rotated(boxes, scores, 0.5, max_out=10)
    idx, valid = np.asarray(idx), np.asarray(valid)
    assert idx.shape == (10,) and valid.shape == (10,)
    assert valid[:2].all() and not valid[2:].any()
    np.testing.assert_array_equal(idx[:2], [0, 1])
    np.testing.assert_array_equal(idx[2:], -1)


def test_roipool_cap_exceeds_points():
    """ADVICE r1: cap > N points must not crash; pads valid=False."""
    rng = np.random.default_rng(1)
    pts = rng.uniform(-1, 1, size=(100, 3)).astype(np.float32)
    feats = rng.normal(size=(100, 4)).astype(np.float32)
    boxes = np.array([[0, 0, 0, 2, 2, 2, 0.0]], np.float32)
    xyz, pf, valid, count = box3d.roipool3d(pts, feats, boxes, cap=512)
    valid, count = np.asarray(valid), np.asarray(count)
    assert xyz.shape == (1, 512, 3) and pf.shape == (1, 512, 4)
    assert valid.sum() == count[0] == 100  # box covers the whole cloud
    assert not valid[0, 100:].any()
    np.testing.assert_array_equal(np.asarray(xyz)[0, 100:], 0.0)
