"""shaDow on-disk format IO.

Implements the same canonical data-directory layout as the reference
(`data_converter.py:419-483`, `loader.py:63-96`) so datasets prepared for
the reference drop straight into this framework:

    <prefix>/<name>/adj_full_raw.npz|npy      scipy-CSR or {indptr,indices[,data]}
    <prefix>/<name>/adj_train_raw.*           (inductive only)
    <prefix>/<name>/adj_*_undirected.npy      cached undirected conversion
    <prefix>/<name>/feat_full.npy             [N, F] float32
    <prefix>/<name>/label_full.npy            [N] int  or  [N, C] multilabel
    <prefix>/<name>/split.npy                 {0: train idx, 1: valid, 2: test}
    <prefix>/<name>/cpp/adj_<split>_<type>_<indptr|indices|data>.bin   raw CSR
    <prefix>/<name>/ppr_float/{neighs,scores}_*.bin                    PPR cache

We read/write without scipy (plain numpy structural arrays).
"""
from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np


def to_undirected_csr(indptr: np.ndarray, indices: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Symmetrize a CSR adjacency; dedup; discard edge values.

    Same semantics as reference ``graph_utils.py:19-45`` (union of out- and
    in-neighbors per row) but vectorized instead of a per-row python loop.
    """
    n = indptr.size - 1
    deg = np.diff(indptr)
    src = np.repeat(np.arange(n, dtype=np.int64), deg)
    dst = indices.astype(np.int64)
    # both directions, dedup via unique on (row, col)
    row = np.concatenate([src, dst])
    col = np.concatenate([dst, src])
    key = row * n + col
    key = np.unique(key)
    row_u = (key // n).astype(np.int64)
    col_u = (key % n).astype(np.int64)
    new_indptr = np.zeros(n + 1, dtype=np.int64)
    np.add.at(new_indptr, row_u + 1, 1)
    new_indptr = np.cumsum(new_indptr)
    dtype = np.int32 if max(n, col_u.size) < 2**31 else np.int64
    return new_indptr.astype(dtype), col_u.astype(dtype)


def _save_adj_npy(path: str, indptr: np.ndarray, indices: np.ndarray):
    np.save(path, {"indptr": indptr, "indices": indices}, allow_pickle=True)


def load_adj(prefix: str, dataset: str, type_: str, split_: str,
             suffix: str = "") -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Load an adjacency as (indptr, indices), or None if absent.

    Accepts both the .npz (scipy.save_npz) and .npy (dict) encodings used
    by the reference (``loader.py:124-149``).  ``suffix='_with_val'``
    selects the link-task variant whose adj_full also contains the
    validation edges (``data_converter.py:357-373``).
    """
    assert split_ in ("full", "train") and type_ in ("raw", "undirected")
    base = f"{prefix}/{dataset}/adj_{split_}_{type_}{suffix}"
    if os.path.isfile(base + ".npz"):
        with np.load(base + ".npz") as z:
            # scipy csr_matrix save_npz layout
            return z["indptr"], z["indices"]
    if os.path.isfile(base + ".npy"):
        d = np.load(base + ".npy", allow_pickle=True)
        if isinstance(d, np.ndarray):
            d = d[()]
        return d["indptr"], d["indices"]
    return None


def write_bin_csr(dir_cpp: str, split_: str, type_: str,
                  indptr: np.ndarray, indices: np.ndarray):
    """Raw-binary CSR dump (uint32 elements).

    Byte-compatible with the reference's direct C++ load path
    (``data_converter.py:462-468`` writes, ``ParallelSampler.cpp:70-86``
    reads): flat little-endian uint32 arrays, no header.
    """
    os.makedirs(dir_cpp, exist_ok=True)
    assert type_ in ("undirected", "raw")
    # file tag is the type_ verbatim — the reference writes and loads
    # adj_<split>_undirected_<d>.bin (data_converter.py:464-468,
    # loader.py:66-80); an abbreviated tag would not be discovered
    indptr.astype(np.uint32).tofile(
        f"{dir_cpp}/adj_{split_}_{type_}_indptr.bin")
    indices.astype(np.uint32).tofile(
        f"{dir_cpp}/adj_{split_}_{type_}_indices.bin")
    # empty data file = "all ones" (validate_bin_file maps missing data to '')
    open(f"{dir_cpp}/adj_{split_}_{type_}_data.bin", "wb").close()


def save_shadow_format(prefix: str, name: str, *, indptr, indices, feat, label,
                       node_set=None, edge_set=None, indptr_train=None,
                       indices_train=None, indptr_with_val=None,
                       indices_with_val=None, write_bin: bool = True):
    """Write a dataset directory in shaDow format."""
    d = f"{prefix}/{name}"
    os.makedirs(d, exist_ok=True)
    _save_adj_npy(f"{d}/adj_full_raw.npy", indptr, indices)
    if indptr_train is not None:
        _save_adj_npy(f"{d}/adj_train_raw.npy", indptr_train, indices_train)
    if indptr_with_val is not None:
        # link-task alternative adj_full incl. validation edges
        # (reference adj_full_raw_with_val, data_converter.py:373)
        _save_adj_npy(f"{d}/adj_full_raw_with_val.npy", indptr_with_val,
                      indices_with_val)
    np.save(f"{d}/feat_full.npy", np.asarray(feat, dtype=np.float32))
    if label is not None:
        np.save(f"{d}/label_full.npy", label)
    split = node_set if node_set is not None else edge_set
    np.save(f"{d}/split.npy", split, allow_pickle=True)
    if write_bin:
        write_bin_csr(f"{d}/cpp", "full", "raw", indptr, indices)
        if indptr_train is not None:
            write_bin_csr(f"{d}/cpp", "train", "raw", indptr_train, indices_train)
    return d
