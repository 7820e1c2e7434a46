"""Functional stand-in for ``ogb.nodeproppred`` (not installed here).

``Evaluator.eval`` reproduces the OGB node-classification accuracy
semantics (mean over rows of y_pred == y_true; reference consumption at
`shaDow/postproc_CnS.py:89-91` and `shaDow/metric.py:50`).

``DglNodePropPredDataset`` reads a planted-SBM dataset exported in
shaDow's on-disk format when ``SHADOW_AB_OGB_DATA`` points at its
directory (the postproc A/B harness sets it) — this is what lets the
UNMODIFIED reference C&S code run on the same stored graph both
frameworks train on.  Without the env var it raises, as ogb datasets
need network downloads.
"""
import os

import numpy as np


class Evaluator:
    def __init__(self, name=None, *a, **kw):
        self.name = name

    def eval(self, input_dict):
        yp = np.asarray(input_dict["y_pred"]).reshape(-1)
        yt = np.asarray(input_dict["y_true"]).reshape(-1)
        return {"acc": float((yp == yt).mean())}


class DglNodePropPredDataset:
    def __init__(self, name=None, *a, **kw):
        d = os.environ.get("SHADOW_AB_OGB_DATA")
        if not d:
            raise RuntimeError(
                "ogb datasets need network downloads, unavailable in this "
                "environment; set SHADOW_AB_OGB_DATA to a shaDow-format "
                "dataset dir to use the planted stand-in")
        import torch
        import dgl

        adj = np.load(os.path.join(d, "adj_full_raw.npy"),
                      allow_pickle=True).item()
        indptr, indices = adj["indptr"], adj["indices"]
        n = indptr.size - 1
        src = np.repeat(np.arange(n, dtype=np.int64), np.diff(indptr))
        self._graph = dgl.graph((torch.from_numpy(src),
                                 torch.from_numpy(indices.astype(np.int64))),
                                num_nodes=n)
        feat = np.load(os.path.join(d, "feat_full.npy"), mmap_mode="r")
        self._graph.ndata["feat"] = torch.empty((n, feat.shape[1]))
        label = np.load(os.path.join(d, "label_full.npy"))
        if label.ndim == 2:                      # one-hot bool export
            label = label.argmax(1)
        self._labels = torch.from_numpy(label.astype(np.int64)).reshape(-1, 1)
        split = np.load(os.path.join(d, "split.npy"),
                        allow_pickle=True).item()
        # shaDow split keys: 0/1/2 = train/valid/test (frontend/__init__.py)
        self._split = {name: torch.from_numpy(np.asarray(split[m],
                                                         dtype=np.int64))
                       for name, m in (("train", 0), ("valid", 1),
                                       ("test", 2))}

    def get_idx_split(self):
        return self._split

    def __getitem__(self, i):
        assert i == 0
        return self._graph, self._labels


class PygNodePropPredDataset:
    def __init__(self, *a, **kw):
        raise RuntimeError(
            "ogb datasets need network downloads, unavailable in this "
            "environment")
