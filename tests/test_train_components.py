"""Metrics, postprocessing, complexity, profiler, converter unit tests."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from shadow_gnn_tpu import TRAIN, VALID, TEST
from shadow_gnn_tpu.train.metrics import Metrics, f1_scores, hits_at_k


def test_f1_scores_manual():
    y_true = np.array([0, 0, 1, 1, 2])
    y_pred = np.array([0, 1, 1, 1, 0])
    mic, mac = f1_scores(y_true, y_pred, 3)
    # micro-F1 == accuracy for single-label
    assert abs(mic - 0.6) < 1e-9
    # per-class: c0 p=1/2 r=1/2 f=.5 ; c1 p=2/3 r=1 f=.8 ; c2 f=0
    assert abs(mac - (0.5 + 0.8 + 0.0) / 3) < 1e-9


def test_f1_multilabel():
    y_true = np.array([[1, 0], [1, 1], [0, 1]])
    y_pred = np.array([[1, 0], [0, 1], [0, 1]])
    mic, mac = f1_scores(y_true, y_pred, 2)
    # tp = 1+2=3... per class: c0 tp1 fp0 fn1 -> f1 2/3 ; c1 tp2 fp0 fn0 -> 1
    assert abs(mac - (2 / 3 + 1.0) / 2) < 1e-9
    assert abs(mic - 2 * 3 / (2 * 3 + 0 + 1)) < 1e-9


def test_hits_at_k():
    pos = np.array([0.9, 0.5, 0.3])
    neg = np.array([0.8, 0.6, 0.4, 0.2])
    # K=2: 2nd best neg = 0.6 -> pos > 0.6: only 0.9 -> 1/3
    assert abs(hits_at_k(pos, neg, 2) - 1 / 3) < 1e-9
    assert hits_at_k(pos, np.array([0.1]), 5) == 1.0   # fewer negs than K


def test_metrics_window_is_better():
    m = Metrics("toy", False, "accuracy", 2)
    better, l, a = m.is_better([1.0, 0.5], 99, [0.5, 0.7], 0.55)
    assert better and abs(a - 0.6) < 1e-9
    better2, _, a2 = m.is_better([1.0, 0.5], l, [0.5, 0.6], 0.6)
    assert not better2 and a2 == 0.6


def test_correct_smooth_improves_noisy_preds():
    """C&S smooth over a homophilous graph must improve noisy preds."""
    from shadow_gnn_tpu.postproc.cns import correct_smooth
    rng = np.random.default_rng(0)
    n, c = 800, 4
    lab = rng.integers(0, c, n)
    # strongly homophilous random graph: 90% intra-community edges
    src = rng.integers(0, n, 6000)
    same = rng.random(6000) < 0.9
    dst = np.where(same, -1, rng.integers(0, n, 6000))
    for i in np.where(same)[0]:
        pool = np.where(lab == lab[src[i]])[0]
        dst[i] = pool[rng.integers(pool.size)]
    keep = src != dst
    row = np.concatenate([src[keep], dst[keep]])
    col = np.concatenate([dst[keep], src[keep]])
    key = np.unique(row.astype(np.int64) * n + col)
    indptr = np.zeros(n + 1, np.int64)
    np.add.at(indptr, (key // n).astype(int) + 1, 1)
    indptr = np.cumsum(indptr).astype(np.int32)
    indices = (key % n).astype(np.int32)
    onehot = np.eye(c, dtype=np.float32)[lab]
    noisy = 0.6 * onehot + 0.4 * rng.random((n, c)).astype(np.float32)
    flip = rng.random(n) < 0.35     # 35% corrupted rows
    noisy[flip] = rng.random((int(flip.sum()), c))
    node_set = {TRAIN: np.arange(0, 500), VALID: np.arange(500, 650),
                TEST: np.arange(650, 800)}
    acc_orig, acc_cs = correct_smooth(
        indptr, indices, lab, node_set, [noisy], use_norm=False, alpha=0.8)
    assert acc_cs[TEST][0] > acc_orig[TEST][0] + 0.05, (acc_orig, acc_cs)


def test_post_ensemble_trains():
    from shadow_gnn_tpu.postproc.ens import train_post_ensemble
    rng = np.random.default_rng(0)
    n, f, c = 600, 16, 4
    lab = rng.integers(0, c, n)
    centers = rng.normal(size=(c, f)).astype(np.float32)
    emb1 = centers[lab] + 0.5 * rng.normal(size=(n, f)).astype(np.float32)
    emb2 = centers[lab] + 0.8 * rng.normal(size=(n, f)).astype(np.float32)
    ns = {TRAIN: np.arange(0, 400), VALID: np.arange(400, 500),
          TEST: np.arange(500, 600)}
    acc = train_post_ensemble(ns, [emb1, emb2], lab,
                              {"dim": f, "act": "leakyrelu", "loss": "softmax"},
                              {"lr": 0.05, "batch_size": 64, "end": 20,
                               "dropout": 0.0})
    assert acc[TEST] > 0.6, acc


def test_complexity_counts(tmp_path):
    from test_train_e2e import BASE_CONFIG, make_trainer
    from shadow_gnn_tpu.train.complexity import compute_complexity
    tr = make_trainer(tmp_path, BASE_CONFIG)
    ops = compute_complexity(tr, num_roots_budget=64)
    assert ops[VALID] > 0


def test_profiler_stats(tmp_path):
    from test_train_e2e import BASE_CONFIG, make_trainer
    tr = make_trainer(tmp_path, BASE_CONFIG)
    tr._ensure_tables(TRAIN)
    _, roots, rows, _, _, _, _ = tr._epoch_arrays(TRAIN)
    bs, _ = tr._sample_branch_batches(TRAIN, roots[0], rows[0],
                                      jax.random.PRNGKey(0),
                                      tr._mode_arrays(TRAIN))
    tr.profiler.update_batch(bs)
    s = tr.profiler.summary()
    assert s["avg_nodes"][0] > 1
    assert s["avg_edges"][0] > 0
    # PPR k=16 scope: hop-1 neighbors should dominate an ego-net
    assert s["hop_composition"][0][1] > 0    # self


def test_saint_converter_roundtrip(tmp_path):
    import scipy.sparse as sp
    import json
    from shadow_gnn_tpu.data.converter import convert_saint
    from shadow_gnn_tpu.data.loader import load_data
    rng = np.random.default_rng(0)
    n = 50
    a = sp.random(n, n, density=0.1, format="csr", random_state=1)
    a = ((a + a.T) > 0).astype(bool)
    sd = tmp_path / "saint"
    os.makedirs(sd)
    sp.save_npz(sd / "adj_full.npz", a.tocsr())
    sp.save_npz(sd / "adj_train.npz", a.tocsr())
    np.save(sd / "feats.npy", rng.normal(size=(n, 4)).astype(np.float32))
    json.dump({str(i): int(i % 3) for i in range(n)},
              open(sd / "class_map.json", "w"))
    json.dump({"tr": list(range(0, 30)), "va": list(range(30, 40)),
               "te": list(range(40, 50))}, open(sd / "role.json", "w"))
    convert_saint(str(tmp_path / "data"), "mini", str(sd))
    raw = load_data(str(tmp_path / "data"), "mini",
                    {"to_undirected": False, "transductive": True})
    assert raw.num_nodes == n
    assert raw.label_full.shape == (n,)
    assert raw.node_set[TRAIN].size == 30


def _tar_dir(src_dir, out_path):
    import tarfile
    with tarfile.open(out_path, "w:gz") as t:
        t.add(src_dir, arcname=os.path.basename(src_dir))
    return str(out_path)


def test_tarball_ingest_shadow_layout(tmp_path):
    """--data_tarball with an already-shaDow archive: files copied."""
    from shadow_gnn_tpu.data.converter import ingest_tarball
    from shadow_gnn_tpu.data.format import save_shadow_format
    from shadow_gnn_tpu.data.loader import load_data
    from shadow_gnn_tpu.data.synthetic import make_synthetic_dataset
    g = make_synthetic_dataset(num_nodes=60, avg_deg=4, num_feat=5,
                               num_classes=3, seed=0)
    save_shadow_format(str(tmp_path / "stage"), "flickr",
                       indptr=g.indptr_full, indices=g.indices_full,
                       feat=g.feat_full, label=g.label_full,
                       node_set=g.node_set)
    tb = _tar_dir(str(tmp_path / "stage" / "flickr"),
                  tmp_path / "flickr.tar.gz")
    out = ingest_tarball(tb, "flickr", str(tmp_path / "data"))
    raw = load_data(str(tmp_path / "data"), "flickr",
                    {"to_undirected": False, "transductive": True})
    assert raw.num_nodes == 60 and out.endswith("flickr")


def test_tarball_ingest_saint_layout(tmp_path):
    import scipy.sparse as sp
    import json
    from shadow_gnn_tpu.data.converter import ingest_tarball
    from shadow_gnn_tpu.data.loader import load_data
    rng = np.random.default_rng(0)
    n = 40
    a = sp.random(n, n, density=0.15, format="csr", random_state=1)
    a = ((a + a.T) > 0).astype(bool)
    sd = tmp_path / "saint_pkg"
    os.makedirs(sd)
    sp.save_npz(sd / "adj_full.npz", a.tocsr())
    sp.save_npz(sd / "adj_train.npz", a.tocsr())
    np.save(sd / "feats.npy", rng.normal(size=(n, 4)).astype(np.float32))
    json.dump({str(i): int(i % 3) for i in range(n)},
              open(sd / "class_map.json", "w"))
    json.dump({"tr": list(range(0, 20)), "va": list(range(20, 30)),
               "te": list(range(30, 40))}, open(sd / "role.json", "w"))
    tb = _tar_dir(str(sd), tmp_path / "reddit.tar.gz")
    ingest_tarball(tb, "reddit", str(tmp_path / "data"))
    raw = load_data(str(tmp_path / "data"), "reddit",
                    {"to_undirected": False, "transductive": True})
    assert raw.num_nodes == n and raw.node_set[TRAIN].size == 20


def test_tarball_ingest_ogb_node_csv(tmp_path):
    """OGB raw CSV layout parsed with numpy (no ogb package)."""
    import gzip
    from shadow_gnn_tpu.data.converter import ingest_tarball
    from shadow_gnn_tpu.data.loader import load_data
    rng = np.random.default_rng(1)
    n, e = 30, 120
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    pkg = tmp_path / "arxiv_pkg"
    raw_d = pkg / "raw"
    split_d = pkg / "split" / "time"
    os.makedirs(raw_d), os.makedirs(split_d)

    def wcsv(path, arr):
        with gzip.open(path, "wt") as f:
            for row in np.atleast_2d(arr.T).T if arr.ndim == 1 else arr:
                f.write(",".join(str(x) for x in np.atleast_1d(row)) + "\n")

    wcsv(raw_d / "edge.csv.gz", np.stack([src, dst], 1))
    wcsv(raw_d / "num-node-list.csv.gz", np.array([n]))
    wcsv(raw_d / "node-feat.csv.gz",
         np.round(rng.normal(size=(n, 3)), 4))
    wcsv(raw_d / "node-label.csv.gz", rng.integers(0, 4, n))
    wcsv(split_d / "train.csv.gz", np.arange(0, 18))
    wcsv(split_d / "valid.csv.gz", np.arange(18, 24))
    wcsv(split_d / "test.csv.gz", np.arange(24, 30))
    tb = _tar_dir(str(pkg), tmp_path / "arxiv.tar.gz")
    ingest_tarball(tb, "arxiv", str(tmp_path / "data"))
    raw = load_data(str(tmp_path / "data"), "arxiv",
                    {"to_undirected": False, "transductive": True})
    assert raw.num_nodes == n
    assert raw.feat_full.shape == (n, 3)
    assert raw.node_set[VALID].size == 6


def test_read_csv_gz_preserves_empty_fields(tmp_path):
    """Empty CSV fields/lines are pandas' NaN na_rep in OGB raw files;
    they must parse POSITIONALLY (a whitespace split would collapse
    them and shift every following value — silent label corruption)."""
    from shadow_gnn_tpu.data.converter import _read_csv_gz

    def w(name, txt):
        p = tmp_path / name
        p.write_text(txt)
        return str(p)

    a = _read_csv_gz(w("a.csv", "1,2\n3,4\n"), np.float64)
    assert a.shape == (2, 2) and a[1, 1] == 4
    b = _read_csv_gz(w("b.csv", "1,\n,4\n"), np.float64)
    assert np.isnan(b[0, 1]) and np.isnan(b[1, 0]) and b[1, 1] == 4
    c = _read_csv_gz(w("c.csv", "5\n\n7\n"), np.float64)
    assert c.shape == (3,) and np.isnan(c[1]) and c[2] == 7
    d = _read_csv_gz(w("d.csv", "1,,3\n4,5,6\n"), np.float64)
    assert d.shape == (2, 3) and np.isnan(d[0, 1]) and d[1, 2] == 6
    # trailing NaN rows survive (only ONE terminator newline stripped)
    e = _read_csv_gz(w("e.csv", "1\n\n\n"), np.float64)
    assert e.shape == (3,) and e[0] == 1 and np.isnan(e[1:]).all()
    # an empty line in a multi-col file is a FULL row of NaNs
    f_ = _read_csv_gz(w("f.csv", "1,2\n\n3,4\n"), np.float64)
    assert f_.shape == (3, 2) and np.isnan(f_[1]).all() and f_[2, 0] == 3
    # adjacent empty fields don't merge
    g = _read_csv_gz(w("g.csv", "1,,,4\n5,6,7,8\n"), np.float64)
    assert g.shape == (2, 4) and np.isnan(g[0, 1:3]).all() and g[0, 3] == 4
    # single trailing empty row in a multi-col file survives too
    h = _read_csv_gz(w("h.csv", "1,2\n\n"), np.float64)
    assert h.shape == (2, 2) and np.isnan(h[1]).all()


def test_read_csv_gz_streams_across_chunk_boundaries(tmp_path):
    """The parser reads in bounded chunks (a papers100M-class feat CSV
    is ~50+ GB of text); empty fields/lines falling EXACTLY on chunk
    boundaries must parse identically to the whole-file read.  Every
    tiny chunk size sweeps the cut through every byte position of each
    fixture, covering blocks that start/end with ',' or '\\n'."""
    from shadow_gnn_tpu.data.converter import _read_csv_gz

    fixtures = [
        "1,2\n3,4\n",          # plain
        "1,\n,4\n",            # leading/trailing empty fields
        "5\n\n7\n",            # empty line, single col
        "1,2\n\n3,4\n",        # empty line, multi col
        "1\n\n\n",             # trailing NaN rows
        "1,,,4\n5,6,7,8\n",    # adjacent empties
        "\n\n1,2\n3,4",        # leading empty rows + unterminated tail
        ",,\n1,2,3\n,,\n",     # full-NaN first/last rows
        "1,2\n\n",             # single trailing empty row
    ]
    for txt in fixtures:
        p = tmp_path / "x.csv"
        p.write_text(txt)
        ref = _read_csv_gz(str(p), np.float64)
        for cb in (1, 2, 3, 5, 7):
            got = _read_csv_gz(str(p), np.float64, chunk_bytes=cb)
            np.testing.assert_array_equal(got, ref, err_msg=(txt, cb))

    # a bigger .gz file with scattered empties, parsed at a 1MB chunk
    # size (forces many boundary cuts) == the one-chunk parse
    import gzip
    rng = np.random.default_rng(0)
    rows = []
    for i in range(200_000):
        r = [str(x) for x in rng.integers(0, 100, 4)]
        if i % 997 == 0:
            r[rng.integers(0, 4)] = ""
        rows.append(",".join(r) if i % 4001 else "")
    big = tmp_path / "big.csv.gz"
    with gzip.open(big, "wt") as f:
        f.write("\n".join(rows) + "\n")
    whole = _read_csv_gz(str(big), np.float64, chunk_bytes=1 << 30)
    chunked = _read_csv_gz(str(big), np.float64, chunk_bytes=1 << 20)
    assert whole.shape == (200_000, 4)
    np.testing.assert_array_equal(whole, chunked)


def test_tarball_ingest_ogb_link_pt(tmp_path):
    """OGB link layout: edge CSV + torch-pickled splits (collab)."""
    import gzip
    import torch
    from shadow_gnn_tpu.data.converter import ingest_tarball
    from shadow_gnn_tpu.data.loader import load_data
    rng = np.random.default_rng(2)
    n, e = 25, 80
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    pkg = tmp_path / "collab_pkg"
    raw_d = pkg / "raw"
    split_d = pkg / "split" / "time"
    os.makedirs(raw_d), os.makedirs(split_d)
    with gzip.open(raw_d / "edge.csv.gz", "wt") as f:
        for s, d in zip(src, dst):
            f.write(f"{s},{d}\n")
    with gzip.open(raw_d / "num-node-list.csv.gz", "wt") as f:
        f.write(f"{n}\n")
    with gzip.open(raw_d / "node-feat.csv.gz", "wt") as f:
        for row in rng.normal(size=(n, 2)):
            f.write(f"{row[0]:.4f},{row[1]:.4f}\n")

    def edges(k):
        return torch.tensor(rng.integers(0, n, (k, 2)))

    torch.save({"edge": edges(30)}, split_d / "train.pt")
    torch.save({"edge": edges(8), "edge_neg": edges(8)},
               split_d / "valid.pt")
    torch.save({"edge": edges(8), "edge_neg": edges(8)},
               split_d / "test.pt")
    tb = _tar_dir(str(pkg), tmp_path / "collab.tar.gz")
    ingest_tarball(tb, "collab", str(tmp_path / "data"))
    raw = load_data(str(tmp_path / "data"), "collab",
                    {"to_undirected": False, "transductive": True})
    assert raw.num_nodes == n
    assert raw.edge_set[TRAIN]["pos"].shape == (30, 2)
    assert raw.edge_set[TEST]["neg"].shape == (8, 2)


def test_loader_autoconvert_dispatch(tmp_path):
    """Missing dataset dir: known datasets route to the converter
    (reference loader.py:42-43); unknown names fail with the plain
    missing-file error.  SAINT sets can't auto-convert without the
    distribution dir — the converter says so."""
    import pytest
    from shadow_gnn_tpu.data.loader import load_data
    with pytest.raises(AssertionError, match="GraphSAINT distribution"):
        load_data(str(tmp_path), "flickr",
                  {"to_undirected": False, "transductive": True})
    with pytest.raises(FileNotFoundError):
        load_data(str(tmp_path), "not_a_dataset",
                  {"to_undirected": False, "transductive": True})


def test_all_reference_configs_parse():
    """Every shipped reference training yml parses + decouples."""
    import glob
    from shadow_gnn_tpu.train.config import parse_config, decouple_ensemble
    from shadow_gnn_tpu.sampling.batch import default_n_pad
    files = sorted(glob.glob("/root/reference/config_train/**/*.yml",
                             recursive=True))
    if not files:
        pytest.skip("reference configs not available")
    for f in files:
        p = parse_config(f)
        for c in decouple_ensemble(p["config_sampler_train"]["configs"]):
            if c["method"] != "full":
                assert default_n_pad(c) > 0


def test_logger_window_selection(tmp_path):
    """Window-averaged best-model selection (center/last/best aggr)."""
    from shadow_gnn_tpu.train.logger import Logger
    from shadow_gnn_tpu.train.metrics import Metrics

    def run(aggr, metrics_seq):
        m = Metrics("toy", False, "accuracy", 2)
        lg = Logger(m, str(tmp_path / aggr), term_window_size=2,
                    term_window_aggr=aggr, no_log=True)
        for ep, acc in enumerate(metrics_seq):
            lg.log_epoch(VALID, ep, {"loss": 1.0 - acc, "accuracy": acc})
            lg.update_best_model(ep, {"w": np.ones(1) * ep}, {"o": 0})
        lg.validate_result()
        return lg

    seq = [0.5, 0.6, 0.9, 0.7, 0.4]
    # best window = epochs (2,3) avg 0.8
    lg = run("center", seq)
    assert lg.best_epoch == 3     # window [2,3], center pick = index 1
    lg2 = run("last", seq)
    assert lg2.best_epoch == 3
    lg3 = run("best_accuracy", seq)
    assert lg3.best_epoch == 2    # highest acc within the window
    # restored params match the elected epoch
    p, _ = lg3.restore_model(None)
    assert float(p["w"][0]) == 2


def test_fused_gat_auto_default(monkeypatch, tmp_path):
    """fused_gat=None auto-enables the Pallas attention kernel for GAT
    on accelerator platforms and keeps the dense chain on CPU (interpret
    mode is orders slower); explicit False always wins."""
    from shadow_gnn_tpu.data.synthetic import make_synthetic_dataset
    from shadow_gnn_tpu.train import pipeline as pipeline_mod
    from shadow_gnn_tpu.train.config import parse_config
    from shadow_gnn_tpu.train.logger import Logger
    from shadow_gnn_tpu.train.metrics import Metrics
    from shadow_gnn_tpu import TRAIN

    g = make_synthetic_dataset(num_nodes=400, avg_deg=6, seed=3)
    g.node_set[TRAIN] = g.node_set[TRAIN][:32]
    cfgd = {
        "data": {"transductive": True},
        "architecture": {"aggr": "gat", "heads": 2, "num_layers": 2,
                         "dim": 16, "pooling": "center", "residue": "none",
                         "act": "relu", "loss": "softmax"},
        "hyperparameter": {"lr": 0.01, "dropout": 0.0, "batch_size": 16,
                           "end": 1},
        "sampler": [{"method": "ppr", "phase": "train", "k": [8],
                     "epsilon": [1e-4]}],
    }
    m = Metrics("toy", False, "accuracy", 1)

    def mk(platform, fused):
        class FakeDev:
            def memory_stats(self):
                return {}
        FakeDev.platform = platform
        monkeypatch.setattr(pipeline_mod.jax, "devices",
                            lambda *a, **k: [FakeDev()])
        tr = pipeline_mod.Trainer("toy", str(tmp_path), g, parse_config(cfgd),
                                  m, Logger(m, str(tmp_path / "log"),
                                            no_log=True),
                                  seed=0, use_device_ppr=False,
                                  fused_gat=fused)
        return tr.model_cfg.fused_gat

    assert mk("tpu", None) is True
    assert mk("cpu", None) is False
    assert mk("tpu", False) is False


def test_huge_epoch_chunked_train(tmp_path, monkeypatch):
    """TRAIN epochs beyond max_scan_batches dispatch as sequential
    fixed-size scan programs + a remainder program (papers100M-class
    split sizes; single huge scans crash the axon TPU worker).  The
    chunked path must thread params through and still learn."""
    monkeypatch.setenv("SHADOW_MAX_SCAN_BATCHES", "3")
    import numpy as np
    from shadow_gnn_tpu import TEST
    from shadow_gnn_tpu.data.synthetic import make_synthetic_dataset
    from shadow_gnn_tpu.train.config import parse_config
    from shadow_gnn_tpu.train.logger import Logger
    from shadow_gnn_tpu.train.metrics import Metrics
    from shadow_gnn_tpu.train.pipeline import Trainer

    g = make_synthetic_dataset(num_nodes=1200, avg_deg=8, num_feat=16,
                               num_classes=5, seed=0)
    cfg = {
        "data": {"transductive": True},
        "architecture": {"dim": 32, "aggr": "sage", "loss": "softmax",
                         "num_layers": 2, "act": "relu",
                         "feature_augment": "hops", "residue": "none",
                         "pooling": "center"},
        "hyperparameter": {"end": 3, "lr": 1e-2, "dropout": 0.1,
                           "dropedge": 0.0, "batch_size": 64},
        "sampler": [{"method": "ppr", "phase": "train", "k": [16],
                     "epsilon": [1e-4]}],
    }
    m = Metrics("toy", False, "accuracy", 1)
    tr = Trainer("toy", "", g, parse_config(cfg), m,
                 Logger(m, str(tmp_path), no_log=True), seed=0)
    assert tr.max_scan_batches == 3
    # 720 train roots / batch 64 = 12 batches -> chunks of 3 (+ none)
    tr.train()
    assert tr.logger.final_stats[TEST]["accuracy"] > 0.8
