"""Datasets and host-side batching.

Capability parity with the reference's three dataset stacks:
  * ModelNet40 normal-resampled (`pointnet2/data/ModelNet40Loader.py:26-141`
    — LMDB caching replaced by an npz cache; same item semantics: take the
    first `num_points` of a shuffled prefix, pc_normalize the xyz)
  * S3DIS HDF5 (`pointnet2/data/Indoor3DSemSegLoader.py:25-94` — Area_5
    held out for test, random point subset per item)
  * KITTI resampled classification set
    (`Final_Project/pointnet2/data/resampled_dataset.py:8-91` — file-list
    dataset `{category}_{idx}`, 80/20 random train/val split)

plus a minimal epoch iterator (shuffle + fixed-size batches) replacing
torch DataLoader.
"""
from __future__ import annotations

import os
from typing import Iterator, Optional, Tuple

import numpy as np

from pctpu.core.io import read_modelnet_txt


def pc_normalize_np(xyz: np.ndarray) -> np.ndarray:
    centroid = xyz.mean(axis=0)
    xyz = xyz - centroid
    m = np.max(np.sqrt((xyz ** 2).sum(-1)))
    return xyz / max(m, 1e-12)


MODELNET40_URL = ("https://shapenet.cs.stanford.edu/media/"
                  "modelnet40_normal_resampled.zip")


class ModelNet40Dataset:
    """Directory layout of the 'modelnet40_normal_resampled' zip:
    <root>/<category>/<category>_XXXX.txt (x,y,z,nx,ny,nz CSV) with
    modelnet40_train.txt / modelnet40_test.txt id lists.

    cache=True builds a PERSISTENT on-disk cache on first pass — one mmap'd
    `.npy` of concatenated rows plus an offsets/labels `.npz` — so later
    runs skip the CSV parse entirely (the LMDB-cache role of the reference's
    ModelNet40Loader.py:60-101). download=True fetches the official zip when
    the root is missing (ModelNet40Loader.py:38-40); requires network egress.
    """

    def __init__(self, root: str, num_points: int = 4096, train: bool = True,
                 cache: bool = True, seed: int = 0, download: bool = False):
        if download and not os.path.exists(
                os.path.join(root, "modelnet40_shape_names.txt")):
            self._download(root)
        self.root = root
        self.num_points = num_points
        self.train = train
        self.rng = np.random.default_rng(seed)
        split = "train" if train else "test"
        list_path = os.path.join(root, f"modelnet40_{split}.txt")
        with open(list_path) as f:
            ids = [line.strip() for line in f if line.strip()]
        cats_path = os.path.join(root, "modelnet40_shape_names.txt")
        with open(cats_path) as f:
            self.categories = [line.strip() for line in f if line.strip()]
        cat_index = {c: i for i, c in enumerate(self.categories)}
        self.items = []
        for sid in ids:
            cat = "_".join(sid.split("_")[:-1])
            self.items.append(
                (os.path.join(root, cat, sid + ".txt"), cat_index[cat]))
        self._points = None     # mmap'd [total_rows, 6]
        self._offsets = None    # [n_items+1]
        if cache:
            self._load_or_build_cache(split)

    @staticmethod
    def _download(root: str) -> None:
        import urllib.request
        import zipfile
        os.makedirs(root, exist_ok=True)
        zip_path = os.path.join(root, "modelnet40_normal_resampled.zip")
        urllib.request.urlretrieve(MODELNET40_URL, zip_path)  # noqa: S310
        with zipfile.ZipFile(zip_path) as z:
            # the zip nests everything under modelnet40_normal_resampled/
            for m in z.namelist():
                rel = m.split("/", 1)
                if len(rel) == 2 and rel[1]:
                    target = os.path.join(root, rel[1])
                    os.makedirs(os.path.dirname(target), exist_ok=True)
                    if not m.endswith("/"):
                        with z.open(m) as src, open(target, "wb") as dst:
                            dst.write(src.read())
        os.remove(zip_path)

    def _cache_paths(self, split: str) -> Tuple[str, str]:
        return (os.path.join(self.root, f"_pctpu_{split}_points.npy"),
                os.path.join(self.root, f"_pctpu_{split}_meta.npz"))

    def _load_or_build_cache(self, split: str) -> None:
        pts_path, meta_path = self._cache_paths(split)
        if os.path.exists(pts_path) and os.path.exists(meta_path):
            meta = np.load(meta_path)
            if meta["n_items"] == len(self.items):
                self._offsets = meta["offsets"]
                self._points = np.load(pts_path, mmap_mode="r")
                return
        rows = []
        offsets = np.zeros(len(self.items) + 1, np.int64)
        for i, (path, _) in enumerate(self.items):
            pts, nrm = read_modelnet_txt(path)
            rows.append(np.hstack([pts, nrm]).astype(np.float32))
            offsets[i + 1] = offsets[i] + rows[-1].shape[0]
        data = np.concatenate(rows) if rows else np.zeros((0, 6), np.float32)
        np.save(pts_path, data)
        np.savez(meta_path, offsets=offsets, n_items=len(self.items))
        self._offsets = offsets
        self._points = np.load(pts_path, mmap_mode="r")

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i: int) -> Tuple[np.ndarray, int]:
        path, label = self.items[i]
        if self._points is not None:
            raw = self._points[self._offsets[i]:self._offsets[i + 1]]
        else:
            pts, nrm = read_modelnet_txt(path)
            raw = np.hstack([pts, nrm]).astype(np.float32)
        # reference semantics (ModelNet40Loader.py:125-141): shuffle a prefix
        # capped at 1e4 points, keep num_points, normalize xyz
        cap = min(raw.shape[0], 10_000)
        idx = self.rng.permutation(cap)[: self.num_points]
        if idx.shape[0] < self.num_points:  # repeat if the model is tiny
            idx = np.resize(idx, self.num_points)
        item = np.array(raw[idx], np.float32)
        item[:, :3] = pc_normalize_np(item[:, :3])
        return item, label


S3DIS_URL = ("https://shapenet.cs.stanford.edu/media/"
             "indoor3d_sem_seg_hdf5_data.zip")


class S3DISDataset:
    """HDF5 indoor3d_sem_seg files: ply_data_all_N.h5 with (data [B,4096,9],
    label [B,4096]); Area_5 rooms held out as test. `download=True`
    fetches + unpacks the official zip when `root` is missing
    (`Indoor3DSemSegLoader.py:31-33` parity)."""

    @staticmethod
    def _download(root: str) -> None:
        import urllib.request
        import zipfile
        os.makedirs(root, exist_ok=True)
        zip_path = os.path.join(root, "indoor3d_sem_seg_hdf5_data.zip")
        urllib.request.urlretrieve(S3DIS_URL, zip_path)  # noqa: S310
        with zipfile.ZipFile(zip_path) as z:
            # the zip nests everything under indoor3d_sem_seg_hdf5_data/
            for m in z.namelist():
                rel = m.split("/", 1)
                if len(rel) == 2 and rel[1] and not m.endswith("/"):
                    target = os.path.join(root, rel[1])
                    os.makedirs(os.path.dirname(target), exist_ok=True)
                    with z.open(m) as src, open(target, "wb") as dst:
                        dst.write(src.read())
        os.remove(zip_path)

    def __init__(self, root: str, num_points: int = 4096, train: bool = True,
                 test_area: int = 5, seed: int = 0,
                 download: bool = False):
        import h5py
        self.num_points = num_points
        self.rng = np.random.default_rng(seed)
        if download and not os.path.exists(
                os.path.join(root, "all_files.txt")):
            self._download(root)
        with open(os.path.join(root, "all_files.txt")) as f:
            h5_files = [os.path.join(root, os.path.basename(l.strip()))
                        for l in f if l.strip()]
        with open(os.path.join(root, "room_filelist.txt")) as f:
            rooms = [l.strip() for l in f if l.strip()]
        datas, labels = [], []
        for hf in h5_files:
            with h5py.File(hf, "r") as h:
                datas.append(h["data"][:])
                labels.append(h["label"][:])
        data = np.concatenate(datas).astype(np.float32)
        label = np.concatenate(labels).astype(np.int32)
        is_test = np.array([f"Area_{test_area}" in r for r in rooms])
        sel = ~is_test if train else is_test
        self.data, self.label = data[sel], label[sel]

    def __len__(self):
        return self.data.shape[0]

    def __getitem__(self, i: int):
        n = self.data.shape[1]
        idx = self.rng.permutation(n)[: self.num_points]
        return self.data[i, idx], self.label[i, idx]


class KITTIResampledDataset:
    """Resampled KITTI object set: <root>/<split-list>.txt rows
    `{category}_{idx}`, data at <root>/<category>/{idx:06d}.txt (64x6 CSV),
    category list in object_names.txt."""

    def __init__(self, root: str, split_file: str):
        self.root = root
        with open(os.path.join(root, "object_names.txt")) as f:
            self.categories = [l.strip() for l in f if l.strip()]
        cat_index = {c: i for i, c in enumerate(self.categories)}
        self.items = []
        with open(os.path.join(root, split_file)) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                cat = "_".join(line.split("_")[:-1])
                idx = int(line.split("_")[-1])
                self.items.append(
                    (os.path.join(root, cat, f"{idx:06d}.txt"),
                     cat_index[cat]))

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i: int):
        path, label = self.items[i]
        return np.loadtxt(path, delimiter=",", dtype=np.float32), label


def split_train_val(n: int, val_frac: float = 0.2, seed: int = 0):
    """SubsetRandomSampler-style 80/20 split (resampled_dataset.py:66-78)."""
    rng = np.random.default_rng(seed)
    perm = rng.permutation(n)
    n_val = int(np.floor(val_frac * n))
    return perm[n_val:], perm[:n_val]


def iterate_batches(dataset, batch_size: int, shuffle: bool = True,
                    seed: int = 0, drop_last: bool = True,
                    indices: Optional[np.ndarray] = None
                    ) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    """Minimal epoch iterator -> (stacked data, stacked labels)."""
    n = len(dataset)
    order = np.asarray(indices) if indices is not None else np.arange(n)
    if shuffle:
        order = np.random.default_rng(seed).permutation(order)
    end = (len(order) // batch_size) * batch_size if drop_last else len(order)
    for s in range(0, end, batch_size):
        chunk = order[s:s + batch_size]
        xs, ys = zip(*(dataset[int(i)] for i in chunk))
        yield np.stack(xs), np.asarray(ys)


def distance_weighted_resample(points: np.ndarray, num: int,
                               rng: np.random.Generator,
                               extra: Optional[np.ndarray] = None):
    """The Final_Project resampling (`1_generating-training-set.py:185-199`,
    `detect.py:296-312`): choice weights = mean pairwise distance (favors
    boundary points), with replacement iff upsampling; returns zero-centered
    points (centered on the ORIGINAL cloud mean, reference parity)."""
    n = points.shape[0]
    d = np.linalg.norm(points[:, None, :] - points[None, :, :], axis=-1)
    w = d.mean(axis=0)
    ssum = w.sum()
    w = np.full(n, 1.0 / n) if ssum <= 0 else w / ssum
    idx = rng.choice(n, size=num, replace=num > n, p=w)
    out = points[idx] - points.mean(axis=0)
    if extra is not None:
        return out, extra[idx]
    return out
