"""The scripts/ref_shims stand-ins let the UNMODIFIED reference run for
the convergence A/B (scripts/reference_ab.py).  Their semantics must
match the real packages on the call patterns the reference uses —
otherwise the A/B compares against a subtly different reference."""
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts", "ref_shims"))

_SHIM_MODS = ("torch_scatter", "torch_geometric", "torch_geometric.nn",
              "torch_geometric.utils", "ogb", "ogb.nodeproppred",
              "ogb.linkproppred")


@pytest.fixture(autouse=True)
def _fresh_shim_imports():
    """test_reference_parity.py installs bare in-memory stand-ins for
    these modules at collection time (sys.modules injection); purge them
    so each test here imports the REAL scripts/ref_shims packages, then
    restore whatever was there."""
    saved = {m: sys.modules.pop(m) for m in _SHIM_MODS if m in sys.modules}
    yield
    for m in _SHIM_MODS:
        sys.modules.pop(m, None)
    sys.modules.update(saved)


def test_scatter_sum_max_match_loop():
    from torch_scatter import scatter
    rng = np.random.default_rng(0)
    src = torch.tensor(rng.normal(size=37).astype(np.float32))
    idx = torch.tensor(rng.integers(0, 9, size=37))
    for reduce, np_red in (("sum", np.add.reduce), ("max", np.maximum.reduce)):
        got = scatter(src, idx, reduce=reduce)
        want = np.zeros(int(idx.max()) + 1, np.float32)
        for v, i in zip(src.numpy(), idx.numpy()):
            if reduce == "sum":
                want[i] += v
            else:
                want[i] = max(want[i], v) if want[i] != 0 else v
        # torch_scatter fills empty slots with 0; max of negative values
        # against a 0-initialized slot is the value itself (scatter_reduce
        # include_self=False), so compare via explicit loop semantics:
        want2 = np.zeros(int(idx.max()) + 1, np.float32)
        seen = np.zeros(int(idx.max()) + 1, bool)
        for v, i in zip(src.numpy(), idx.numpy()):
            if reduce == "sum":
                want2[i] += v
            elif not seen[i] or v > want2[i]:
                want2[i] = v
            seen[i] = True
        np.testing.assert_allclose(got.numpy(), want2, rtol=1e-6)


def test_scatter_matches_reference_gat_pattern():
    """layers.py:572-578 pattern: 1-D values indexed by adj row ids."""
    from torch_scatter import scatter
    vals = torch.tensor([1.0, -2.0, 3.0, 0.5, 4.0])
    rows = torch.tensor([0, 0, 1, 2, 2])
    mx = scatter(vals, rows, reduce="max")
    np.testing.assert_allclose(mx.numpy(), [1.0, 3.0, 4.0])
    sm = scatter(vals, rows, reduce="sum")
    np.testing.assert_allclose(sm.numpy(), [-1.0, 3.0, 4.5])


def test_to_undirected_and_self_loops():
    from torch_geometric.utils import add_self_loops, to_undirected
    ei = torch.tensor([[0, 1, 2], [1, 2, 0]])
    und = to_undirected(ei)
    pairs = set(map(tuple, und.t().numpy().tolist()))
    assert pairs == {(0, 1), (1, 0), (1, 2), (2, 1), (2, 0), (0, 2)}
    with_loops, _ = add_self_loops(und, num_nodes=3)
    pairs = set(map(tuple, with_loops.t().numpy().tolist()))
    assert {(0, 0), (1, 1), (2, 2)} <= pairs


def test_negative_sampling_avoids_existing():
    from torch_geometric.utils import negative_sampling
    torch.manual_seed(0)
    n = 50
    ei = torch.tensor(np.array([(i, (i + 1) % n) for i in range(n)]).T)
    neg = negative_sampling(ei, num_nodes=n, num_neg_samples=200)
    assert neg.shape == (2, 200)
    existing = set(map(tuple, ei.t().numpy().tolist()))
    got = set(map(tuple, neg.t().numpy().tolist()))
    assert not (got & existing)


def test_global_sort_pool_matches_pyg_semantics():
    from torch_geometric.nn import global_sort_pool
    x = torch.tensor([[1.0, 0.3], [2.0, 0.1], [3.0, 0.2],
                      [4.0, 0.9]])
    batch = torch.tensor([0, 0, 0, 1])
    out = global_sort_pool(x, batch, k=2)
    assert out.shape == (2, 4)
    # graph 0: sort by last channel desc -> rows [0 (0.3), 2 (0.2)]
    np.testing.assert_allclose(out[0].numpy(), [1.0, 0.3, 3.0, 0.2])
    # graph 1: one node + zero padding
    np.testing.assert_allclose(out[1].numpy(), [4.0, 0.9, 0.0, 0.0])


def test_link_evaluator_hits_matches_ogb_semantics():
    """ogb.linkproppred.Evaluator shim (used by the reference's
    metric.py:95-103 in the link A/B) == OGB's _eval_hits: threshold is
    the K-th highest negative, hits = fraction of positives strictly
    above it.  Cross-checked against this framework's hits_at_k so both
    A/B sides provably score with identical semantics."""
    from ogb.linkproppred import Evaluator
    from shadow_gnn_tpu.train.metrics import hits_at_k

    ev = Evaluator(name="ogbl-collab")
    assert ev.K == 50
    rng = np.random.default_rng(3)
    pos = rng.normal(size=400).astype(np.float32)
    neg = rng.normal(size=900).astype(np.float32)
    got = ev.eval({"y_pred_pos": pos, "y_pred_neg": neg})["hits@50"]
    kth = np.sort(neg)[-50]
    assert got == pytest.approx(float((pos > kth).mean()))
    assert got == pytest.approx(hits_at_k(pos, neg, 50))
    # fewer negatives than K: every positive is a hit (ogb behavior)
    assert ev.eval({"y_pred_pos": pos, "y_pred_neg": neg[:49]}
                   )["hits@50"] == 1.0
    assert hits_at_k(pos, neg[:49], 50) == 1.0
