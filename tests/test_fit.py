"""Trainer-loop test: learnable synthetic task + checkpoint/resume."""
import numpy as np
import pytest

from pctpu.nn.config import TrainConfig
from pctpu.nn import fit as F


class ToyPointDataset:
    """Two easily separable classes: flat disks vs tall columns."""

    def __init__(self, n=32, num_points=128, seed=0):
        rng = np.random.default_rng(seed)
        self.items = []
        for i in range(n):
            label = i % 2
            pts = np.zeros((num_points, 6), np.float32)
            if label == 0:
                pts[:, :2] = rng.uniform(-1, 1, (num_points, 2))
                pts[:, 2] = rng.normal(scale=0.02, size=num_points)
            else:
                pts[:, 2] = rng.uniform(-1, 1, num_points)
                pts[:, :2] = rng.normal(scale=0.05, size=(num_points, 2))
            pts[:, 3:] = rng.normal(scale=0.1, size=(num_points, 3))
            self.items.append((pts, label))

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        return self.items[i]


@pytest.fixture(scope="module")
def toy_cfg():
    return TrainConfig(model="cls-ssg", num_classes=2, num_points=128,
                       batch_size=8, epochs=3, lr=1e-3, decay_step=1e9)


@pytest.mark.slow
def test_fit_learns_toy_task(toy_cfg, tmp_path):
    train = ToyPointDataset(n=32, seed=0)
    val = ToyPointDataset(n=16, seed=1)
    out = F.fit(toy_cfg, train, val, workdir=str(tmp_path / "run"),
                augment_pipeline=(), eval_interval=1)
    assert out["best_val_acc"] > 0.9
    # checkpoint written
    import os
    assert any(d.startswith("ckpt_") for d in os.listdir(tmp_path / "run"))
    # metrics history written
    assert (tmp_path / "run" / "metrics.jsonl").exists()

    rep = F.test_report(out["model"], out["state"],
                        ToyPointDataset(n=16, seed=2), toy_cfg.batch_size,
                        class_names=["disk", "column"])
    assert rep["acc"] > 0.9
    assert rep["confusion_matrix"].shape == (2, 2)
    assert "disk" in rep["report"]


@pytest.mark.slow
def test_fit_resume(toy_cfg, tmp_path):
    import dataclasses
    cfg1 = dataclasses.replace(toy_cfg, epochs=1)
    train = ToyPointDataset(n=16, seed=0)
    val = ToyPointDataset(n=8, seed=1)
    wd = str(tmp_path / "resume_run")
    F.fit(cfg1, train, val, workdir=wd, augment_pipeline=())
    cfg2 = dataclasses.replace(toy_cfg, epochs=2)
    out = F.fit(cfg2, train, val, workdir=wd, resume=True,
                augment_pipeline=())
    # resumed past epoch 0
    assert out["steps"] <= len(train) // toy_cfg.batch_size * 2
