"""Training CLI: the reference's two entry points in one command.

  python -m pctpu.nn.train_cli task=cls model=ssg data=/path [key=value ...]

Hydra-style `key=value` overrides over the preset config tree (the
reference's `Classification_ModelNet40/pointnet2/train.py` hydra CLI and
`Final_Project/pointnet2/train.py` argparse trainer). Tasks:
  cls    — ModelNet40 classification (ModelNet40Dataset layout)
  semseg — S3DIS semantic segmentation (indoor3d HDF5 layout)
  kitti  — Final_Project 4-class KITTI object classification
           (resampled dataset layout: train.txt/test.txt)
"""
from __future__ import annotations

import dataclasses
import sys

from pctpu.nn import config as C
from pctpu.nn.data import (KITTIResampledDataset, ModelNet40Dataset,
                           S3DISDataset)
from pctpu.nn.fit import fit, test_report

PRESETS = {
    ("cls", "ssg"): C.MODELNET40_CLS_SSG,
    ("cls", "msg"): C.MODELNET40_CLS_MSG,
    ("semseg", "ssg"): C.S3DIS_SEMSEG_SSG,
    ("semseg", "msg"): C.S3DIS_SEMSEG_MSG,
    ("kitti", "msg"): C.KITTI_CLS_MSG,
    ("kitti", "ssg"): dataclasses.replace(C.KITTI_CLS_MSG, model="cls-ssg"),
}


def parse_overrides(argv):
    kv = {}
    for arg in argv:
        if arg in ("--help", "-h", "help"):
            print(__doc__)
            print("Config keys (override with key=value):")
            for f in dataclasses.fields(C.TrainConfig):
                print(f"  {f.name} (default {f.default!r})")
            raise SystemExit(0)
        if "=" not in arg:
            raise SystemExit(f"expected key=value, got {arg!r}")
        k, v = arg.split("=", 1)
        kv[k] = v
    return kv


def main(argv=None):
    kv = parse_overrides(sys.argv[1:] if argv is None else argv)
    task = kv.pop("task", "cls")
    model = kv.pop("model", "ssg")
    data_root = kv.pop("data", None)
    workdir = kv.pop("workdir", f"runs/{task}_{model}")
    resume = kv.pop("resume", "false").lower() == "true"
    mode = kv.pop("mode", "train")
    cfg = PRESETS[(task, model)]
    # typed overrides onto the dataclass
    fields = {f.name: f.type for f in dataclasses.fields(C.TrainConfig)}
    casts = {}
    for k, v in kv.items():
        if k not in fields:
            raise SystemExit(f"unknown config key {k}")
        cur = getattr(cfg, k)
        casts[k] = type(cur)(v) if not isinstance(cur, bool) \
            else v.lower() == "true"
    cfg = dataclasses.replace(cfg, **casts)

    if data_root is None:
        raise SystemExit("data=<dataset root> is required")
    if task == "cls":
        train_ds = ModelNet40Dataset(data_root, cfg.num_points, train=True)
        val_ds = ModelNet40Dataset(data_root, cfg.num_points, train=False)
        test_ds = val_ds
        class_names = train_ds.categories
    elif task == "semseg":
        train_ds = S3DISDataset(data_root, cfg.num_points, train=True)
        val_ds = S3DISDataset(data_root, cfg.num_points, train=False)
        test_ds = val_ds
        class_names = None
    else:
        train_ds = KITTIResampledDataset(data_root, "train.txt")
        val_ds = KITTIResampledDataset(data_root, "test.txt")
        test_ds = val_ds
        class_names = train_ds.categories

    if mode == "train":
        out = fit(cfg, train_ds, val_ds, workdir=workdir, resume=resume,
                  tensorboard=True)
        print(f"best val_acc: {out['best_val_acc']:.4f} "
              f"@ epoch {out['best_epoch']}")
    else:  # mode=test: confusion matrix + report (Final_Project test mode)
        from pctpu.nn import checkpoint as ckpt
        from pctpu.nn import train as T
        import jax
        import jax.numpy as jnp
        sample_pc, _ = test_ds[0]
        sample = jnp.asarray(sample_pc)[None].repeat(cfg.batch_size, axis=0)
        model_obj, state = T.create_train_state(
            cfg, jax.random.PRNGKey(0), sample)
        latest = ckpt.latest_checkpoint(workdir)
        if latest:
            state = ckpt.restore_checkpoint(latest[0], state)
        rep = test_report(model_obj, state, test_ds, cfg.batch_size,
                          class_names=class_names)
        print(rep["report"])
        print(rep["confusion_matrix"])


if __name__ == "__main__":
    main()
