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
import jax.numpy as jnp

from pctpu.core import io
from pctpu.core.cloud import PointCloud, round_up
from pctpu.register.pipeline import (RegistrationConfig, register_pair,
                                     register_pairs, result_row)


def load_pair_list(path: str) -> List[Tuple[int, int]]:
    rows = io.read_reg_results(path)
    return [(int(r[0]), int(r[1])) for r in rows[1:]]


def run_registration_dataset(dataset_dir: str, pair_list_path: str,
                             output_path: str,
                             cfg: RegistrationConfig = RegistrationConfig(),
                             capacity: Optional[int] = None,
                             limit: Optional[int] = None,
                             batch_size: int = 1,
                             verbose: bool = True) -> dict:
    """dataset_dir must contain point_clouds/<idx>.bin (oxford 6-float).

    batch_size > 1 solves pairs through the batched full pipeline
    (`register_pairs`: batch-native voxel -> dense FPFH -> RANSAC ->
    multiscale mega ICP, one compiled program per batch shape); a failing
    batch falls back to per-pair solves so one bad pair cannot take down
    its batchmates (SURVEY.md §5.3 error isolation).
    """
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

    def load(idx):
        pts, _ = io.read_oxford_bin(os.path.join(cloud_dir, f"{idx}.bin"))
        return PointCloud.from_numpy(pts, capacity=capacity)

    def solve_one(i, trg, src, results, failed):
        try:
            out = register_pair(load(src), load(trg),
                                key=jax.random.PRNGKey(i), cfg=cfg)
            results.append(result_row(trg, src, out.T))
            if verbose:
                print(f"[{i+1}/{len(pairs)}] {trg},{src}: "
                      f"fitness={float(out.ransac_fitness):.3f} "
                      f"icp_iters={int(out.icp_iters)}")
        except Exception as e:  # per-pair isolation
            failed.append((trg, src, repr(e)))
            results.append((trg, src, np.zeros(3), np.array([1., 0, 0, 0])))

    results, failed = [], []
    if batch_size <= 1:
        for i, (trg, src) in enumerate(pairs):
            solve_one(i, trg, src, results, failed)
    else:
        for b0 in range(0, len(pairs), batch_size):
            chunk = pairs[b0:b0 + batch_size]
            # pad the final batch by repeating its last pair so every
            # batch reuses one compiled program
            padded = chunk + [chunk[-1]] * (batch_size - len(chunk))
            try:
                srcs = [load(s) for (_, s) in padded]
                trgs = [load(t) for (t, _) in padded]
                sbatch = PointCloud(
                    points=jnp.stack([c.points for c in srcs]),
                    mask=jnp.stack([c.mask for c in srcs]))
                tbatch = PointCloud(
                    points=jnp.stack([c.points for c in trgs]),
                    mask=jnp.stack([c.mask for c in trgs]))
                keys = jax.vmap(jax.random.PRNGKey)(
                    jnp.arange(b0, b0 + batch_size))
                out = register_pairs(sbatch, tbatch, keys=keys, cfg=cfg)
                Ts = np.asarray(out.T)
                for j, (trg, src) in enumerate(chunk):
                    results.append(result_row(trg, src, Ts[j]))
                if verbose:
                    print(f"[{b0+len(chunk)}/{len(pairs)}] batch ok, "
                          f"min matches="
                          f"{int(jnp.min(out.num_matches[:len(chunk)]))}")
            except Exception:  # batch failed: isolate per pair
                for j, (trg, src) in enumerate(chunk):
                    solve_one(b0 + j, trg, src, results, failed)
    io.write_reg_results(output_path, results)
    return {"n_pairs": len(pairs), "n_failed": len(failed), "failed": failed}


def main(argv=None):
    """CLI parity with the reference's `python Registration/main.py` run
    (`main.py:183-222`): solve a pair-list over an oxford-format dataset
    and write the result file; optionally evaluate against ground truth."""
    import argparse

    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--dataset", required=True,
                   help="dir containing point_clouds/<idx>.bin")
    p.add_argument("--pairs", required=True, help="pair list file")
    p.add_argument("--output", required=True, help="result file to write")
    p.add_argument("--gt", help="ground-truth result file to evaluate "
                                "against (evaluate_rt)")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--limit", type=int)
    p.add_argument("--voxel-size", type=float, default=2.0)
    p.add_argument("--feature-radius", type=float, default=10.0)
    p.add_argument("--normal-radius", type=float, default=4.0)
    p.add_argument("--ransac-dist", type=float, default=4.0)
    p.add_argument("--downsample-capacity", type=int, default=2048)
    p.add_argument("--keypoints", choices=["all", "iss"], default="all",
                   help="matching sites: all voxel points or ISS keypoints")
    args = p.parse_args(argv)

    cfg = RegistrationConfig(voxel_size=args.voxel_size,
                             feature_radius=args.feature_radius,
                             normal_radius=args.normal_radius,
                             ransac_dist=args.ransac_dist,
                             downsample_capacity=args.downsample_capacity,
                             keypoints=args.keypoints)
    res = run_registration_dataset(args.dataset, args.pairs, args.output,
                                   cfg=cfg, limit=args.limit,
                                   batch_size=args.batch_size)
    print(f"pairs={res['n_pairs']} failed={res['n_failed']}")
    if args.gt:
        from pctpu.register.evaluate import evaluate_rt
        ev = evaluate_rt(args.gt, args.output)
        print(f"success_rate={ev['success_rate']:.4f} "
              f"n_success={ev['n_success']} avg_rte={ev['avg_rte']:.4f} "
              f"avg_rre={ev['avg_rre']:.4f}")
    return res


if __name__ == "__main__":
    main()
