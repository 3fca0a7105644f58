"""High-level training loop: the reference's two trainers in one function.

Combines: jitted train/eval steps (pctpu.nn.train), on-device augmentation,
EarlyStopping(patience) + top-k checkpointing on val_acc (Lightning harness,
`Classification_ModelNet40/pointnet2/train.py:33-42`), resume, grad clip,
dual stdout+file logging and metric history (hand-rolled trainer,
`Final_Project/pointnet2/train.py:46-49,196-219`), and test-time confusion
matrix + classification report (`:120-168`).
"""
from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from pctpu.nn import augment as aug
from pctpu.nn import checkpoint as ckpt
from pctpu.nn import train as T
from pctpu.nn.config import TrainConfig
from pctpu.nn.data import iterate_batches


class Logger:
    """Dual stdout + file logger (`Final_Project/pointnet2/train.py:46-49`)
    plus JSONL metric history and optional TensorBoard scalars
    (`train.py:75-76,111-115` parity, via torch.utils.tensorboard)."""

    def __init__(self, workdir: Optional[str], tensorboard: bool = False):
        self.f = None
        self.jsonl = None
        self.tb = None
        if workdir:
            os.makedirs(workdir, exist_ok=True)
            self.f = open(os.path.join(workdir, "train.log"), "a")
            self.jsonl = open(os.path.join(workdir, "metrics.jsonl"), "a")
            if tensorboard:
                try:
                    from torch.utils.tensorboard import SummaryWriter
                    self.tb = SummaryWriter(os.path.join(workdir, "tb"))
                except Exception:
                    self.tb = None

    def log(self, msg: str):
        print(msg)
        if self.f:
            self.f.write(msg + "\n")
            self.f.flush()

    def metrics(self, record: Dict):
        if self.jsonl:
            self.jsonl.write(json.dumps(record) + "\n")
            self.jsonl.flush()
        if self.tb is not None and "epoch" in record:
            for k, v in record.items():
                if isinstance(v, (int, float)) and k != "epoch":
                    self.tb.add_scalar(k, v, record["epoch"])


def evaluate(model, state, dataset, batch_size: int,
             collect_logits: bool = False):
    ev = jax.jit(T.make_eval_step(model))
    losses, accs, ys, preds = [], [], [], []
    for pc, labels in iterate_batches(dataset, batch_size, shuffle=False):
        out = ev(state, jnp.asarray(pc), jnp.asarray(labels))
        losses.append(float(out["loss"]))
        accs.append(float(out["acc"]))
        if collect_logits:
            ys.append(labels)
            preds.append(np.argmax(np.asarray(out["logits"]), axis=-1))
    res = {"loss": float(np.mean(losses)) if losses else float("nan"),
           "acc": float(np.mean(accs)) if accs else float("nan")}
    if collect_logits and ys:
        res["labels"] = np.concatenate([y.reshape(-1) for y in ys])
        res["preds"] = np.concatenate([p.reshape(-1) for p in preds])
    return res


def fit(cfg: TrainConfig, train_ds, val_ds=None,
        workdir: Optional[str] = None,
        resume: bool = False,
        augment_pipeline=aug.DEFAULT_TRAIN_PIPELINE,
        early_stop_patience: int = 5,
        eval_interval: int = 1,
        ckpt_keep: int = 2,
        max_steps: Optional[int] = None,
        tensorboard: bool = False) -> Dict[str, Any]:
    """Train to cfg.epochs (or max_steps); returns summary with best val acc."""
    log = Logger(workdir, tensorboard=tensorboard)
    rng = jax.random.PRNGKey(cfg.seed)
    sample_pc, _ = train_ds[0]
    sample = jnp.asarray(sample_pc)[None].repeat(cfg.batch_size, axis=0)
    model, state = T.create_train_state(cfg, rng, sample)
    step_fn = jax.jit(T.make_train_step(model, cfg))

    start_epoch = 0
    if resume and workdir:
        latest = ckpt.latest_checkpoint(workdir)
        if latest:
            path, step = latest
            state = ckpt.restore_checkpoint(path, state)
            start_epoch = step
            log.log(f"resumed from {path} (epoch {start_epoch})")

    best_acc, best_epoch, stale = -1.0, -1, 0
    steps_done = 0
    for epoch in range(start_epoch, cfg.epochs):
        t0 = time.time()
        tr_loss, tr_acc, nb = 0.0, 0.0, 0
        for pc, labels in iterate_batches(train_ds, cfg.batch_size,
                                          shuffle=True, seed=cfg.seed + epoch):
            key = jax.random.fold_in(rng, steps_done)
            pc_dev = jnp.asarray(pc)
            if augment_pipeline:
                pc_dev = aug.augment_batch(key, pc_dev, augment_pipeline)
            state, metrics = step_fn(state, pc_dev, jnp.asarray(labels),
                                     jax.random.fold_in(key, 1))
            tr_loss += float(metrics["loss"])
            tr_acc += float(metrics["acc"])
            nb += 1
            steps_done += 1
            if max_steps and steps_done >= max_steps:
                break
        rec = {"epoch": epoch, "train_loss": tr_loss / max(nb, 1),
               "train_acc": tr_acc / max(nb, 1),
               "time_s": round(time.time() - t0, 2)}

        if val_ds is not None and (epoch + 1) % eval_interval == 0:
            val = evaluate(model, state, val_ds, cfg.batch_size)
            rec.update(val_loss=val["loss"], val_acc=val["acc"])
            if val["acc"] > best_acc:
                best_acc, best_epoch, stale = val["acc"], epoch, 0
                if workdir:
                    ckpt.save_checkpoint(workdir, state, epoch + 1, ckpt_keep)
            else:
                stale += 1
        log.log(f"epoch {epoch}: " + " ".join(
            f"{k}={v:.4f}" if isinstance(v, float) else f"{k}={v}"
            for k, v in rec.items()))
        log.metrics(rec)
        if max_steps and steps_done >= max_steps:
            break
        if val_ds is not None and stale >= early_stop_patience:
            log.log(f"early stop at epoch {epoch} "
                    f"(best val_acc {best_acc:.4f} @ {best_epoch})")
            break

    return {"model": model, "state": state, "best_val_acc": best_acc,
            "best_epoch": best_epoch, "steps": steps_done}


def test_report(model, state, test_ds, batch_size: int,
                class_names: Optional[Iterable[str]] = None,
                heatmap_path: Optional[str] = None) -> Dict:
    """Confusion matrix + sklearn classification report
    (`Final_Project/pointnet2/train.py:120-168`); optionally renders the
    reference's confusion-matrix heatmap PNG (`train.py:142-151`)."""
    res = evaluate(model, state, test_ds, batch_size, collect_logits=True)
    from sklearn.metrics import classification_report, confusion_matrix
    labels, preds = res["labels"], res["preds"]
    names = list(class_names) if class_names else None
    # explicit label ids keep the matrix/report shape stable even when a
    # class is absent from a small test split
    ids = list(range(len(names))) if names else None
    cm = confusion_matrix(labels, preds, labels=ids)
    report = classification_report(
        labels, preds, zero_division=0, labels=ids, target_names=names)
    if heatmap_path:
        _render_confusion_heatmap(cm, class_names, heatmap_path)
    return {"acc": res["acc"], "confusion_matrix": cm, "report": report}


def _render_confusion_heatmap(cm, class_names, path: str) -> None:
    """Annotated heatmap PNG, matching the reference's seaborn artifact."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    names = list(class_names) if class_names else [
        str(i) for i in range(cm.shape[0])]
    names = names[:cm.shape[0]]
    fig, ax = plt.subplots(figsize=(5, 4.2))
    im = ax.imshow(cm, cmap="Blues")
    ax.set_xticks(range(cm.shape[1]), names, rotation=45, ha="right")
    ax.set_yticks(range(cm.shape[0]), names)
    ax.set_xlabel("predicted")
    ax.set_ylabel("true")
    thresh = cm.max() / 2.0 if cm.size else 0
    for i in range(cm.shape[0]):
        for j in range(cm.shape[1]):
            ax.text(j, i, str(cm[i, j]), ha="center", va="center",
                    color="white" if cm[i, j] > thresh else "black")
    fig.colorbar(im, ax=ax)
    fig.tight_layout()
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig.savefig(path, dpi=110)
    plt.close(fig)
