"""Checkpoint save/restore for train state.

Parity targets: Lightning ModelCheckpoint top-k on val_acc + resume
(`Classification_ModelNet40/pointnet2/train.py:33-42`) and the hand-rolled
{'epoch','model_state'} torch.save / --resume path
(`Final_Project/pointnet2/train.py:171-193`). Orbax is the store; the state
pytree (params, batch_stats, opt_state, step) round-trips losslessly.
"""
from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import jax
import numpy as np


def _ckpt_dir(workdir: str, step: int) -> str:
    return os.path.join(os.path.abspath(workdir), f"ckpt_{step:08d}")


def save_checkpoint(workdir: str, state: Any, step: int,
                    keep: int = 2) -> str:
    """Save state pytree; prune to the newest `keep` checkpoints
    (Lightning's save_top_k=2 analogue)."""
    import orbax.checkpoint as ocp
    path = _ckpt_dir(workdir, step)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, jax.device_get(state), force=True)
    ckptr.wait_until_finished()
    # prune
    existing = sorted(d for d in os.listdir(workdir)
                      if d.startswith("ckpt_"))
    for d in existing[:-keep]:
        import shutil
        shutil.rmtree(os.path.join(workdir, d), ignore_errors=True)
    return path


def latest_checkpoint(workdir: str) -> Optional[Tuple[str, int]]:
    if not os.path.isdir(workdir):
        return None
    cands = sorted(d for d in os.listdir(workdir) if d.startswith("ckpt_"))
    if not cands:
        return None
    d = cands[-1]
    return os.path.join(workdir, d), int(d.split("_")[1])


def restore_checkpoint(path: str, target: Any) -> Any:
    """Restore into the structure of `target` (an abstract or concrete
    state pytree)."""
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    abstract = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype),
        jax.device_get(target))
    return ckptr.restore(path, abstract)
