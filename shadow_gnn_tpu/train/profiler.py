"""Subgraph statistics profiler.

Equivalent of reference ``shaDow/profiler.py`` (SubgraphProfiler): per-
batch accumulation of hop-composition and node/edge/degree statistics,
per-epoch summary tables.  Works on padded SubgraphBatch blocks with
cheap device reductions; cleared after the first epoch like
``main.py:188``.
"""
from __future__ import annotations

from typing import Dict, List

import numpy as np

from shadow_gnn_tpu.sampling.batch import DIM_1HOT_HOP, SubgraphBatch, hop2onehot


class SubgraphProfiler:
    def __init__(self, num_ensemble: int,
                 metrics={"global": {"hops", "sizes"}}):
        self.num_ensemble = num_ensemble
        self.metrics = metrics
        self.clear_metrics()

    def clear_metrics(self):
        self.hop_comp: List[np.ndarray] = [
            np.zeros(DIM_1HOT_HOP) for _ in range(self.num_ensemble)]
        self.num_subg = [0] * self.num_ensemble
        self.num_nodes = [0.0] * self.num_ensemble
        self.num_edges = [0.0] * self.num_ensemble
        self.enabled = bool(self.metrics.get("global"))

    def update_stats(self, i: int, hop_comp: np.ndarray, num_nodes: float,
                     num_edges: float, num_subg: int):
        """Feed pre-reduced aggregates for branch ``i`` (the jitted
        full-epoch profile pass returns device-side reductions instead
        of per-batch SubgraphBatch pytrees)."""
        if not self.enabled:
            return
        if "hops" in self.metrics.get("global", ()):
            self.hop_comp[i] += np.asarray(hop_comp)
        if "sizes" in self.metrics.get("global", ()):
            self.num_nodes[i] += float(num_nodes)
            self.num_edges[i] += float(num_edges)
        self.num_subg[i] += int(num_subg)

    def update_batch(self, batches: List[SubgraphBatch]):
        if not self.enabled:
            return
        for i, b in enumerate(batches):
            if "hops" in self.metrics.get("global", ()):  # hop composition
                oh = hop2onehot(b.hop) * b.node_mask[..., None]
                self.hop_comp[i] += np.asarray(oh.sum((0, 1)))
            if "sizes" in self.metrics.get("global", ()):
                self.num_nodes[i] += float(np.asarray(b.size.sum()))
                self.num_edges[i] += float(np.asarray(b.adj.sum()))
            self.num_subg[i] += int(b.batch_size)

    def summary(self) -> Dict[str, List]:
        out = {"avg_nodes": [], "avg_edges": [], "avg_deg": [],
               "hop_composition": []}
        for i in range(self.num_ensemble):
            ns = max(self.num_subg[i], 1)
            out["avg_nodes"].append(self.num_nodes[i] / ns)
            out["avg_edges"].append(self.num_edges[i] / ns)
            out["avg_deg"].append(
                self.num_edges[i] / max(self.num_nodes[i], 1.0))
            tot = max(self.hop_comp[i].sum(), 1.0)
            out["hop_composition"].append((self.hop_comp[i] / tot).tolist())
        return out

    def print_summary(self):
        if not self.enabled or max(self.num_subg) == 0:
            return
        s = self.summary()
        hdr = ["branch", "avg nodes", "avg edges", "avg deg"]
        print(" | ".join(f"{h:>10s}" for h in hdr))
        for i in range(self.num_ensemble):
            print(" | ".join([f"{i:>10d}", f"{s['avg_nodes'][i]:>10.1f}",
                              f"{s['avg_edges'][i]:>10.1f}",
                              f"{s['avg_deg'][i]:>10.2f}"]))
            hc = s["hop_composition"][i]
            labels = ["unreach/far", "self"] + [f"{h}-hop" for h in
                                                range(1, len(hc) - 1)]
            print("  hops: " + ", ".join(
                f"{l}={v:.3f}" for l, v in zip(labels, hc)))
