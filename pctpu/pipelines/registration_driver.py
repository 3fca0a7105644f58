"""Registration-dataset driver: solve all pairs, write the result file.

Re-design of `Registration/main.py:183-222`: for each row (idx1=target,
idx2=source) of the pair list, register source onto target and emit
`idx1,idx2,t,q_wxyz`. Per-pair error isolation (SURVEY.md §5.3) replaces the
reference's crash-the-run behavior; clouds are padded to a shared capacity
bucket so every pair reuses one compiled program.
"""
from __future__ import annotations

import os
from typing import List, Optional, Tuple

import numpy as np
import jax

from pctpu.core import io
from pctpu.core.cloud import PointCloud, round_up
from pctpu.register.pipeline import (RegistrationConfig, register_pair,
                                     result_row)


def load_pair_list(path: str) -> List[Tuple[int, int]]:
    rows = io.read_reg_results(path)
    return [(int(r[0]), int(r[1])) for r in rows[1:]]


def run_registration_dataset(dataset_dir: str, pair_list_path: str,
                             output_path: str,
                             cfg: RegistrationConfig = RegistrationConfig(),
                             capacity: Optional[int] = None,
                             limit: Optional[int] = None,
                             verbose: bool = True) -> dict:
    """dataset_dir must contain point_clouds/<idx>.bin (oxford 6-float)."""
    pairs = load_pair_list(pair_list_path)
    if limit:
        pairs = pairs[:limit]
    cloud_dir = os.path.join(dataset_dir, "point_clouds")

    # shared capacity bucket -> one compiled program for all pairs
    if capacity is None:
        sizes = []
        for trg, src in pairs[: min(len(pairs), 20)]:
            for idx in (trg, src):
                p = os.path.join(cloud_dir, f"{idx}.bin")
                sizes.append(os.path.getsize(p) // 24)
        capacity = round_up(int(max(sizes) * 1.1), 4096)

    results, failed = [], []
    for i, (trg, src) in enumerate(pairs):
        try:
            src_pts, _ = io.read_oxford_bin(
                os.path.join(cloud_dir, f"{src}.bin"))
            trg_pts, _ = io.read_oxford_bin(
                os.path.join(cloud_dir, f"{trg}.bin"))
            src_pc = PointCloud.from_numpy(src_pts, capacity=capacity)
            trg_pc = PointCloud.from_numpy(trg_pts, capacity=capacity)
            out = register_pair(src_pc, trg_pc,
                                key=jax.random.PRNGKey(i), cfg=cfg)
            results.append(result_row(trg, src, out.T))
            if verbose:
                print(f"[{i+1}/{len(pairs)}] {trg},{src}: "
                      f"fitness={float(out.ransac_fitness):.3f} "
                      f"icp_iters={int(out.icp_iters)}")
        except Exception as e:  # per-pair isolation
            failed.append((trg, src, repr(e)))
            results.append((trg, src, np.zeros(3), np.array([1., 0, 0, 0])))
    io.write_reg_results(output_path, results)
    return {"n_pairs": len(pairs), "n_failed": len(failed), "failed": failed}
