"""Functional stand-in for ``ogb.linkproppred`` (not installed here).

``Evaluator.eval`` reproduces the OGB link-evaluator hits@K semantics
exactly: the score threshold is the K-th highest NEGATIVE score and
hits@K is the fraction of positives strictly above it (ogb
linkproppred/evaluate.py `_eval_hits`; reference consumption at
`shaDow/metric.py:95-103`).  Dataset classes stay unconstructible —
they would need network downloads.
"""
import numpy as np

_NAME2K = {"ogbl-collab": 50, "ogbl-ppa": 100, "ogbl-ddi": 20}


class Evaluator:
    def __init__(self, name=None, *a, **kw):
        self.name = name
        self.K = _NAME2K.get(name, 50)

    def eval(self, input_dict):
        pos = np.asarray(input_dict["y_pred_pos"]).ravel()
        neg = np.asarray(input_dict["y_pred_neg"]).ravel()
        if neg.size < self.K:
            # ogb: fewer negatives than K means every positive is a hit
            return {f"hits@{self.K}": 1.0}
        kth = np.sort(neg)[-self.K]          # K-th largest negative
        return {f"hits@{self.K}": float((pos > kth).mean())}


class PygLinkPropPredDataset:
    def __init__(self, *a, **kw):
        raise RuntimeError(
            "ogb datasets need network downloads, unavailable in this "
            "environment; only the Evaluator shim is functional")
