"""Dataset conversion: OGB / GraphSAINT -> shaDow on-disk format.

Equivalent of reference ``frontend/data_converter.py``: the DATA_ZOO
registry of supported datasets with their required-file specs, and
``convert2shadow`` which materializes the canonical directory layout
(adj_full_raw, feat_full, label_full, split, cpp/*.bin caches — see
data/format.py).  OGB downloads are gated on the ``ogb`` package being
installed and network egress existing; the GraphSAINT format
(adj_full.npz/adj_train.npz/feats.npy/class_map.json/role.json) needs
only local files.
"""
from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import numpy as np

from shadow_gnn_tpu import TRAIN, VALID, TEST
from shadow_gnn_tpu.data import format as fmt


@dataclass
class ShaDowFiles:
    """Required-file spec per (dataset, task-variant), mirroring the
    ShaDowFiles dataclasses of data_converter.py:25-104."""

    prediction_task: str                  # 'node' | 'link'
    required: List[str] = field(default_factory=lambda: [
        "adj_full_raw", "feat_full.npy", "label_full.npy", "split.npy"])
    optional: List[str] = field(default_factory=list)

    def have_all_files(self, prefix: str, name: str) -> bool:
        d = f"{prefix}/{name}"
        for f in self.required:
            if f == "adj_full_raw":
                if not (os.path.isfile(f"{d}/adj_full_raw.npz")
                        or os.path.isfile(f"{d}/adj_full_raw.npy")):
                    return False
            elif f == "adj_train_raw":
                if not (os.path.isfile(f"{d}/adj_train_raw.npz")
                        or os.path.isfile(f"{d}/adj_train_raw.npy")):
                    return False
            elif not os.path.isfile(f"{d}/{f}"):
                return False
        return True


_NODE = ShaDowFiles("node")
_NODE_IND = ShaDowFiles("node", required=[
    "adj_full_raw", "adj_train_raw", "feat_full.npy", "label_full.npy",
    "split.npy"])
_LINK = ShaDowFiles("link", required=["adj_full_raw", "feat_full.npy",
                                      "split.npy"])

# the 8 supported datasets (data_converter.py:117-150)
DATA_ZOO: Dict[str, Dict[str, ShaDowFiles]] = {
    "flickr":     {"ALL": _NODE, "transductive": _NODE, "inductive": _NODE_IND},
    "reddit":     {"ALL": _NODE, "transductive": _NODE, "inductive": _NODE_IND},
    "yelp":       {"ALL": _NODE, "transductive": _NODE, "inductive": _NODE_IND},
    "arxiv":      {"ALL": _NODE, "transductive": _NODE, "inductive": _NODE},
    "products":   {"ALL": _NODE, "transductive": _NODE, "inductive": _NODE},
    "papers100M": {"ALL": _NODE, "transductive": _NODE, "inductive": _NODE},
    "collab":     {"ALL": _LINK, "with_val_edges": _LINK, "no_val_edges": _LINK},
    "ppa":        {"ALL": _LINK, "with_val_edges": _LINK, "no_val_edges": _LINK},
}

OGB_NAME = {"arxiv": "ogbn-arxiv", "products": "ogbn-products",
            "papers100M": "ogbn-papers100M", "collab": "ogbl-collab",
            "ppa": "ogbl-ppa"}
SAINT_DATASETS = {"flickr", "reddit", "yelp"}


def _coo_to_csr(src, dst, n):
    order = np.argsort(src, kind="stable")
    src, dst = src[order], dst[order]
    indptr = np.zeros(n + 1, np.int64)
    np.add.at(indptr, src + 1, 1)
    indptr = np.cumsum(indptr)
    dtype = np.int32 if max(n, dst.size) < 2**31 else np.int64
    return indptr.astype(dtype), dst.astype(dtype)


def convert_saint(prefix: str, name: str, saint_dir: str):
    """GraphSAINT format -> shaDow (data_converter.py:313-416)."""
    import scipy.sparse as sp
    adj_full = sp.load_npz(f"{saint_dir}/adj_full.npz").astype(bool)
    adj_train = sp.load_npz(f"{saint_dir}/adj_train.npz").astype(bool)
    role = json.load(open(f"{saint_dir}/role.json"))
    feats = np.load(f"{saint_dir}/feats.npy")
    class_map = json.load(open(f"{saint_dir}/class_map.json"))
    n = adj_full.shape[0]
    class_map = {int(k): v for k, v in class_map.items()}
    v0 = next(iter(class_map.values()))
    if isinstance(v0, list):
        label = np.zeros((n, len(v0)), np.float32)
        for k, v in class_map.items():
            label[k] = v
    else:
        label = np.zeros(n, np.int64)
        for k, v in class_map.items():
            label[k] = v
    node_set = {TRAIN: np.asarray(role["tr"], np.int64),
                VALID: np.asarray(role["va"], np.int64),
                TEST: np.asarray(role["te"], np.int64)}
    return fmt.save_shadow_format(
        prefix, name, indptr=adj_full.indptr.astype(np.int64),
        indices=adj_full.indices, feat=feats, label=label, node_set=node_set,
        indptr_train=adj_train.indptr.astype(np.int64),
        indices_train=adj_train.indices)


def convert_ogb_node(prefix: str, name: str):
    """OGB node-property dataset -> shaDow (data_converter.py:164-242)."""
    from ogb.nodeproppred import NodePropPredDataset
    ds = NodePropPredDataset(name=OGB_NAME[name], root=f"{prefix}/_ogb")
    split = ds.get_idx_split()
    graph, label = ds[0]
    n = graph["num_nodes"]
    src, dst = graph["edge_index"][0], graph["edge_index"][1]
    indptr, indices = _coo_to_csr(src.astype(np.int64), dst.astype(np.int64), n)
    label = label.squeeze()
    node_set = {TRAIN: np.asarray(split["train"], np.int64),
                VALID: np.asarray(split["valid"], np.int64),
                TEST: np.asarray(split["test"], np.int64)}
    return fmt.save_shadow_format(
        prefix, name, indptr=indptr, indices=indices,
        feat=graph["node_feat"], label=label, node_set=node_set)


def convert_ogb_link(prefix: str, name: str):
    """OGB link-property dataset -> shaDow (data_converter.py:244-311)."""
    from ogb.linkproppred import LinkPropPredDataset
    ds = LinkPropPredDataset(name=OGB_NAME[name], root=f"{prefix}/_ogb")
    split = ds.get_edge_split()
    graph = ds[0]
    n = graph["num_nodes"]
    src, dst = graph["edge_index"][0], graph["edge_index"][1]
    indptr, indices = _coo_to_csr(src.astype(np.int64), dst.astype(np.int64), n)
    edge_set = {
        TRAIN: {"pos": np.asarray(split["train"]["edge"], np.int64)},
        VALID: {"pos": np.asarray(split["valid"]["edge"], np.int64),
                "neg": np.asarray(split["valid"]["edge_neg"], np.int64)},
        TEST: {"pos": np.asarray(split["test"]["edge"], np.int64),
               "neg": np.asarray(split["test"]["edge_neg"], np.int64)},
    }
    # alternative adj_full with validation edges added both directions
    # (reference data_converter.py:357-373); always converted so a later
    # valedges_as_input run needs no re-download
    val = np.asarray(split["valid"]["edge"], np.int64)
    src_wv = np.concatenate([src.astype(np.int64), val[:, 0], val[:, 1]])
    dst_wv = np.concatenate([dst.astype(np.int64), val[:, 1], val[:, 0]])
    key = np.unique(src_wv * n + dst_wv)
    indptr_wv, indices_wv = _coo_to_csr(key // n, key % n, n)
    return fmt.save_shadow_format(
        prefix, name, indptr=indptr, indices=indices,
        feat=graph["node_feat"], label=None, edge_set=edge_set,
        indptr_with_val=indptr_wv, indices_with_val=indices_wv)


def convert2shadow(name_data: str, prefix: str,
                   saint_dir: Optional[str] = None):
    """Entry point, like reference convert2shaDow (data_converter.py:419)."""
    assert name_data in DATA_ZOO, f"unknown dataset {name_data}"
    if name_data in SAINT_DATASETS:
        assert saint_dir, (
            f"{name_data} uses the GraphSAINT distribution; pass the "
            f"directory holding adj_full.npz/feats.npy/...")
        return convert_saint(prefix, name_data, saint_dir)
    if DATA_ZOO[name_data]["ALL"].prediction_task == "node":
        return convert_ogb_node(prefix, name_data)
    return convert_ogb_link(prefix, name_data)


def _main(argv=None):
    import argparse
    p = argparse.ArgumentParser(
        description="Convert OGB / GraphSAINT datasets to shaDow format")
    p.add_argument("--dataset", required=True, choices=sorted(DATA_ZOO))
    p.add_argument("--prefix", required=True,
                   help="data dir; output goes to <prefix>/<dataset>/")
    p.add_argument("--saint_dir", default=None,
                   help="GraphSAINT distribution dir (flickr/reddit/yelp)")
    a = p.parse_args(argv)
    out = convert2shadow(a.dataset, a.prefix, saint_dir=a.saint_dir)
    print(f"converted {a.dataset} -> {out}")


if __name__ == "__main__":
    _main()
