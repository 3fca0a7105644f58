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
