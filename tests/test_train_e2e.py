"""End-to-end training on synthetic data: learns above chance, CLI works,
checkpoints round-trip."""
import os
import subprocess
import sys

import numpy as np
import pytest

from shadow_gnn_tpu import TRAIN, VALID, TEST
from shadow_gnn_tpu.data import make_synthetic_dataset, save_shadow_format, load_data
from shadow_gnn_tpu.train.config import parse_config
from shadow_gnn_tpu.train.logger import Logger
from shadow_gnn_tpu.train.metrics import Metrics
from shadow_gnn_tpu.train.pipeline import Trainer


BASE_CONFIG = {
    "data": {"to_undirected": False, "transductive": True},
    "architecture": {
        "dim": 32, "aggr": "sage", "loss": "softmax", "num_layers": 2,
        "act": "relu", "feature_augment": "hops", "residue": "none",
        "pooling": "center",
    },
    "hyperparameter": {
        "end": 5, "lr": 0.01, "dropout": 0.1, "dropedge": 0.05,
        "batch_size": 32,
    },
    "sampler": [{"method": "ppr", "phase": "train", "k": [16],
                 "epsilon": [1e-5]}],
}


def make_trainer(tmp_path, cfg_dict, seed=0, **ds_kw):
    g = make_synthetic_dataset(num_nodes=600, avg_deg=8, num_feat=16,
                               num_classes=5, seed=3, **ds_kw)
    parsed = parse_config(cfg_dict)
    if g.prediction_task == "link":
        metric_name = "hits20"
    elif parsed["arch_gnn"]["loss"] == "sigmoid":
        metric_name = "f1"
    else:
        metric_name = "accuracy"
    metrics = Metrics("toy", parsed["arch_gnn"]["loss"] == "sigmoid",
                      metric_name, 1)
    logger = Logger(metrics, str(tmp_path / "log"), no_log=False)
    return Trainer("toy", str(tmp_path), g, parsed, metrics, logger,
                   seed=seed, use_device_ppr=False)


def test_chunked_train_path(tmp_path):
    """The chunked TRAIN program (off by default on the tunnel backend,
    viable on local runtimes) updates params and matches the monolithic
    path's learning behavior."""
    tr = make_trainer(tmp_path, BASE_CONFIG)
    tr._ensure_tables(TRAIN)
    tr._ensure_caches(TRAIN)
    nb, roots, rows, labels_dev, w_dev, _labels_np, _w_np = \
        tr._epoch_arrays(TRAIN)
    import jax
    p_before = jax.device_get(tr.params)
    losses, preds, ovf = tr._run_chunks(TRAIN, True, nb, roots, rows,
                                        labels_dev, w_dev,
                                        jax.random.PRNGKey(0))
    assert np.isfinite(losses).all() and ovf == 0
    p_after = jax.device_get(tr.params)
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(a - b).max()), p_before, p_after)
    assert max(jax.tree_util.tree_leaves(diffs)) > 0
    # a couple of chunked epochs reduce the loss
    for _ in range(2):
        l2, _, _ = tr._run_chunks(TRAIN, True, nb, roots, rows, labels_dev,
                                  w_dev, jax.random.PRNGKey(1))
    assert l2.mean() < losses.mean()
    # padded (zero-weight) steps must be true no-ops: with nonzero Adam
    # momentum accumulated above, an unconditional opt.update would
    # still move params (m_hat/(sqrt(v_hat)+eps) != 0)
    p_before = jax.device_get(tr.params)
    import jax.numpy as jnp
    tr._run_chunks(TRAIN, True, nb, roots, rows, labels_dev,
                   jnp.zeros_like(w_dev), jax.random.PRNGKey(2))
    p_after = jax.device_get(tr.params)
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(a - b).max()), p_before, p_after)
    assert max(jax.tree_util.tree_leaves(diffs)) == 0.0


def test_predict_full_monolithic_mode(tmp_path):
    """predict_full works with chunk_batches=0 (--chunk_batches 0, the
    monolithic round-1 mode): C&S postproc reaches _run_chunks even
    when epoch programs are monolithic."""
    cfg = {**BASE_CONFIG,
           "hyperparameter": {**BASE_CONFIG["hyperparameter"], "end": 1}}
    tr = make_trainer(tmp_path, cfg)
    tr.chunk_batches = 0
    tr.train()
    pred = tr.predict_full(modes=(TEST,))
    assert pred.shape == (600, 5)
    assert np.isfinite(pred).all() and pred.max() > 0


def test_training_learns(tmp_path):
    tr = make_trainer(tmp_path, BASE_CONFIG)
    tr.train()
    acc = tr.logger.final_stats[TEST]["accuracy"]
    assert acc > 0.5, f"synthetic accuracy too low: {acc}"   # chance = 0.2
    # CSV artifacts
    for f in ("epoch_train.csv", "epoch_valid.csv", "final.csv"):
        assert os.path.isfile(tmp_path / "log" / f)
    # checkpoint exists and loads back into an equivalent param tree
    import glob
    ckpts = glob.glob(str(tmp_path / "log" / "saved_model_*.msgpack"))
    assert ckpts
    params2, _ = Logger.load_checkpoint(tr.params, None, ckpts[0])
    stats_before = tr.run_epoch(99, TEST, status="final")
    tr.params = params2
    stats_after = tr.run_epoch(99, TEST, status="final")
    assert abs(stats_before["accuracy"] - stats_after["accuracy"]) < 1e-6


def test_subgraph_preproc_matches_oracle(tmp_path):
    """Non-full preprocess-phase sampler (reference preproc.py:167-202):
    feature smoothening runs minibatch-wise WITHIN ppr-sampled
    subgraphs and writes back only target rows.  Checked row-by-row
    against a numpy oracle of the reference semantics."""
    import oracle
    from shadow_gnn_tpu.sampling import ppr as ppr_mod

    cfg = {**BASE_CONFIG,
           "architecture": {**BASE_CONFIG["architecture"],
                            "feature_smoothen": "sym-2-concat"},
           "hyperparameter": {**BASE_CONFIG["hyperparameter"], "end": 1},
           "sampler": [
               {"method": "ppr", "phase": "preprocess", "k": [12],
                "epsilon": [1e-6]},
               {"method": "ppr", "phase": "train", "k": [16],
                "epsilon": [1e-5]},
           ]}
    g = make_synthetic_dataset(num_nodes=600, avg_deg=8, num_feat=16,
                               num_classes=5, seed=3)
    feat_raw = np.asarray(g.feat_full, np.float32).copy()
    parsed = parse_config(cfg)
    metrics = Metrics("toy", False, "accuracy", 1)
    logger = Logger(metrics, str(tmp_path / "log"), no_log=True)
    tr = Trainer("toy", str(tmp_path), g, parsed, metrics, logger,
                 seed=0, use_device_ppr=False)
    assert tr.dim_feat_smooth == 3 * 16          # sym-2-concat widens 3x
    indptr, indices = g.indptr_full, g.indices_full
    rng = np.random.default_rng(0)
    for mode in (TRAIN, VALID, TEST):
        targets = np.asarray(tr.entity_set[mode])
        pick = rng.choice(targets, 5, replace=False)
        nb_l, sb_l = ppr_mod.ppr_push_host(indptr, indices, pick, 12,
                                           alpha=0.85, epsilon=1e-6,
                                           use_native=False)
        for i, t in enumerate(pick):
            touched = oracle.ppr_scope(nb_l[i], sb_l[i], int(t), 12, 0.0)
            nodes, adj, tl = oracle.induced_subgraph(
                indptr, indices, list(touched), [int(t)])
            deg = np.clip(adj.sum(1), 1.0, None)
            an = adj / np.sqrt(deg)[:, None] / np.sqrt(deg)[None, :]
            x0 = feat_raw[nodes]
            x1 = an @ x0
            x2 = an @ x1
            want = np.concatenate([x0[tl[0]], x1[tl[0]], x2[tl[0]]])
            np.testing.assert_allclose(tr.feat_np[t], want, rtol=1e-4,
                                       atol=1e-5)
    # and the full pipeline trains on the widened features
    stats = tr.run_epoch(0, TRAIN)
    assert np.isfinite(stats["loss"])


def test_csv_reference_protocol(tmp_path):
    """epoch/final CSVs follow the reference's file protocol
    (logging_base.py:398-409,436-454): mode-prefixed headers, VALID/TEST
    rows annotated with the train epoch, single-row final.csv."""
    cfg = {**BASE_CONFIG,
           "hyperparameter": {**BASE_CONFIG["hyperparameter"], "end": 2}}
    tr = make_trainer(tmp_path, cfg)
    tr.train()
    with open(tmp_path / "log" / "epoch_train.csv") as f:
        lines = [l.rstrip("\n") for l in f]
    assert lines[0].split(", ")[:2] == ["epoch", "train_loss"]
    assert lines[1].split(", ")[0].strip() == "0"
    with open(tmp_path / "log" / "epoch_valid.csv") as f:
        lines = [l.rstrip("\n") for l in f]
    assert lines[0].split(", ")[:2] == ["epoch", "valid_loss"]
    # 'e (train_e)' annotation, parseable like the reference's rows
    e_field = lines[1].split(", ")[0]
    assert "(" in e_field and ")" in e_field
    ep, tr_ep = e_field.replace(")", "").split("(")
    assert int(ep) == 0 and int(tr_ep) == 0
    e2 = lines[2].split(", ")[0].replace(")", "").split("(")
    assert int(e2[0]) == 1 and int(e2[1]) == 1
    with open(tmp_path / "log" / "final.csv") as f:
        lines = [l.rstrip("\n") for l in f if l.strip()]
    assert len(lines) == 2, "final.csv must be ONE header + ONE data row"
    hdr = lines[0].split(", ")
    assert hdr[0] == "train_loss" and "valid_loss" in hdr and \
        hdr[-2] == "test_loss" or "test_loss" in hdr
    assert len(lines[1].split(", ")) == len(hdr)
    vals = [float(v) for v in lines[1].split(", ")]
    assert all(np.isfinite(vals))


def test_profiler_full_epoch(tmp_path):
    """The first-epoch profiler pass covers the FULL epoch (reference
    accumulates its whole first epoch, main.py:165,188)."""
    tr = make_trainer(tmp_path, BASE_CONFIG)
    tr._ensure_tables(TRAIN)
    tr._ensure_caches(TRAIN)
    assert tr.profiler.enabled
    rng_state = tr.rng_np.bit_generator.state
    tr._profile_epoch(TRAIN)
    tr.rng_np.bit_generator.state = rng_state
    n_train = len(np.asarray(tr.entity_set[TRAIN]))
    assert tr.profiler.num_subg[0] == n_train
    assert tr.profiler.num_nodes[0] > n_train      # scopes beyond the root
    assert tr.profiler.num_edges[0] > 0
    hop = tr.profiler.hop_comp[0]
    assert hop.sum() > 0 and hop[1] == n_train     # one 'self' per root


@pytest.mark.parametrize("aggr,extra", [
    ("gcn", {}),
    ("gat", {"heads": 2}),
    ("gin", {}),
])
def test_backbones_run(tmp_path, aggr, extra):
    cfg = {**BASE_CONFIG,
           "architecture": {**BASE_CONFIG["architecture"], "aggr": aggr,
                            **extra},
           "hyperparameter": {**BASE_CONFIG["hyperparameter"], "end": 2}}
    tr = make_trainer(tmp_path, cfg)
    tr.train()
    assert tr.logger.final_stats[TEST]["accuracy"] > 0.3


def test_khop_sampler_training(tmp_path):
    cfg = {**BASE_CONFIG,
           "sampler": [{"method": "khop", "phase": "train", "depth": [2],
                        "budget": [5]}],
           "hyperparameter": {**BASE_CONFIG["hyperparameter"], "end": 2}}
    tr = make_trainer(tmp_path, cfg)
    tr.train()
    assert tr.logger.final_stats[TEST]["accuracy"] > 0.3


def test_ensemble_branches(tmp_path):
    cfg = {**BASE_CONFIG,
           "sampler": [{"method": "ppr", "phase": "train", "k": [16, 8],
                        "epsilon": [1e-5, 1e-5]}],
           "hyperparameter": {**BASE_CONFIG["hyperparameter"], "end": 2}}
    tr = make_trainer(tmp_path, cfg)
    assert tr.num_ensemble == 2
    tr.train()
    assert tr.logger.final_stats[TEST]["accuracy"] > 0.3


def test_link_prediction(tmp_path):
    cfg = {
        "data": {"to_undirected": False, "transductive": True},
        "architecture": {
            "dim": 32, "aggr": "sage", "loss": "sigmoid", "num_layers": 2,
            "act": "relu", "feature_augment": "drnls", "residue": "concat",
            "pooling": "sort-8",
        },
        "hyperparameter": {"end": 2, "lr": 0.01, "dropout": 0.1,
                           "dropedge": 0.0, "batch_size": 16},
        "sampler": [{"method": "ppr_st", "phase": "train", "k": [12],
                     "epsilon": [1e-5], "threshold": [0.01]}],
    }
    tr = make_trainer(tmp_path, cfg, task="link")
    assert tr.task == "link"
    tr.train()
    assert "hits20" in tr.logger.final_stats[TEST]


def test_prng_rbg_trains(tmp_path):
    """--prng rbg (counter-based PRNG for dropout/dropedge masks; the
    flagship TPU perf setting) trains and is seed-deterministic."""
    import jax
    prev = jax.config.jax_default_prng_impl
    try:
        g = make_synthetic_dataset(num_nodes=400, avg_deg=6, num_feat=8,
                                   num_classes=4, seed=3)
        cfg = {**BASE_CONFIG,
               "hyperparameter": {**BASE_CONFIG["hyperparameter"], "end": 2}}
        parsed = parse_config(cfg)
        finals = []
        for rep in range(2):
            m = Metrics("toy", False, "accuracy", 1)
            tr = Trainer("toy", str(tmp_path), g, parsed, m,
                         Logger(m, str(tmp_path / f"log{rep}"), no_log=True),
                         seed=7, use_device_ppr=False, prng_impl="rbg")
            tr.train()
            finals.append(tr.logger.final_stats[TEST]["accuracy"])
        assert finals[0] == finals[1]       # same seed, same result
        assert finals[0] > 0.3
    finally:
        jax.config.update("jax_default_prng_impl", prev)


def test_ppa_style_link_hits100(tmp_path):
    """ogbl-ppa semantics: one-hot (species) node features, hits@100
    metric, no valedges variant (data_converter.py:389-416)."""
    g = make_synthetic_dataset(num_nodes=500, avg_deg=6, num_feat=8,
                               num_classes=4, seed=11, task="link")
    rng = np.random.default_rng(0)
    onehot = np.eye(16, dtype=np.float32)[rng.integers(0, 16, g.num_nodes)]
    cfg = {
        "data": {"to_undirected": False, "transductive": True},
        "architecture": {
            "dim": 16, "aggr": "sage", "loss": "sigmoid", "num_layers": 2,
            "act": "relu", "feature_augment": "drnls", "residue": "none",
            "pooling": "center",
        },
        "hyperparameter": {"end": 2, "lr": 0.01, "dropout": 0.0,
                           "batch_size": 16},
        "sampler": [{"method": "ppr", "phase": "train", "k": [8],
                     "epsilon": [1e-5]}],
    }
    import dataclasses
    g = dataclasses.replace(g, feat_full=onehot)
    parsed = parse_config(cfg)
    m = Metrics("toy", True, "hits100", 1)
    tr = Trainer("toy", str(tmp_path), g, parsed, m,
                 Logger(m, str(tmp_path / "log"), no_log=True), seed=0,
                 use_device_ppr=False)
    tr.train()
    stats = tr.logger.final_stats[TEST]
    assert "hits100" in stats and 0.0 <= stats["hits100"] <= 1.0


def test_link_valedges_as_input(tmp_path):
    """collab alternative setting: adj_full for sampling also contains
    the validation edges (reference data_converter.py:357-373; the
    reference loader never actually loads them — we implement the
    intended semantics).  PPR caches must not collide across variants."""
    import glob
    g = make_synthetic_dataset(num_nodes=400, avg_deg=6, num_feat=8,
                               num_classes=4, seed=5, task="link")
    val_pos = g.edge_set[VALID]["pos"]
    n = g.num_nodes
    deg = np.diff(g.indptr_full)
    src = np.repeat(np.arange(n), deg)
    src_wv = np.concatenate([src, val_pos[:, 0], val_pos[:, 1]])
    dst_wv = np.concatenate([g.indices_full.astype(np.int64),
                             val_pos[:, 1], val_pos[:, 0]])
    key = np.unique(src_wv.astype(np.int64) * n + dst_wv.astype(np.int64))
    indptr_wv = np.zeros(n + 1, np.int64)
    np.add.at(indptr_wv, key // n + 1, 1)
    save_shadow_format(str(tmp_path / "data"), "toy", indptr=g.indptr_full,
                       indices=g.indices_full, feat=g.feat_full, label=None,
                       edge_set=g.edge_set,
                       indptr_with_val=np.cumsum(indptr_wv).astype(np.int32),
                       indices_with_val=(key % n).astype(np.int32))
    raw_plain = load_data(str(tmp_path / "data"), "toy",
                          {"to_undirected": False, "transductive": True,
                           "valedges_as_input": False})
    raw_wval = load_data(str(tmp_path / "data"), "toy",
                         {"to_undirected": False, "transductive": True,
                          "valedges_as_input": True})
    assert raw_wval.indices_full.size > raw_plain.indices_full.size
    cfg = {
        "data": {"to_undirected": False, "transductive": True,
                 "valedges_as_input": True},
        "architecture": {
            "dim": 16, "aggr": "sage", "loss": "sigmoid", "num_layers": 2,
            "act": "relu", "feature_augment": "drnls", "residue": "none",
            "pooling": "center",
        },
        "hyperparameter": {"end": 2, "lr": 0.01, "dropout": 0.0,
                           "batch_size": 16},
        "sampler": [{"method": "ppr", "phase": "train", "k": [8],
                     "epsilon": [1e-5]}],
    }
    parsed = parse_config(cfg)
    m = Metrics("toy", True, "hits20", 1)
    tr = Trainer("toy", str(tmp_path / "data"), raw_wval, parsed, m,
                 Logger(m, str(tmp_path / "log"), no_log=True), seed=0,
                 use_device_ppr=False)
    tr.train()
    assert "hits20" in tr.logger.final_stats[TEST]
    caches = glob.glob(str(tmp_path / "data" / "toy" / "ppr_float" / "*"))
    assert caches and all("-wval_" in os.path.basename(c) for c in caches)


def test_multilabel_sigmoid_with_ppr_aug(tmp_path):
    """yelp-style: sigmoid multilabel + hops-pprs augment + sum pooling."""
    cfg = {**BASE_CONFIG,
           "architecture": {**BASE_CONFIG["architecture"], "loss": "sigmoid",
                            "feature_augment": "hops-pprs",
                            "feature_augment_ops": "concat",
                            "residue": "concat", "pooling": "sum"},
           "hyperparameter": {**BASE_CONFIG["hyperparameter"], "end": 2}}
    tr = make_trainer(tmp_path, cfg, multilabel=True)
    tr.train()
    assert "f1mic" in tr.logger.final_stats[TEST] or \
        "accuracy" in tr.logger.final_stats[TEST]


def test_label_use_and_smoothen(tmp_path):
    cfg = {**BASE_CONFIG,
           "architecture": {**BASE_CONFIG["architecture"],
                            "use_label": "no_valid",
                            "feature_smoothen": "sym-2-concat"},
           "hyperparameter": {**BASE_CONFIG["hyperparameter"], "end": 2}}
    tr = make_trainer(tmp_path, cfg)
    assert tr.dim_feat_smooth == 16 * 3      # order-2 concat
    assert tr.dim_label_smooth == 5
    tr.train()
    assert tr.logger.final_stats[TEST]["accuracy"] > 0.3


def test_cli_end_to_end(tmp_path):
    g = make_synthetic_dataset(num_nodes=400, avg_deg=6, num_feat=8,
                               num_classes=4, seed=1)
    save_shadow_format(str(tmp_path / "data"), "toy", indptr=g.indptr_full,
                       indices=g.indices_full, feat=g.feat_full,
                       label=g.label_full, node_set=g.node_set)
    import yaml
    cfg = {**BASE_CONFIG,
           "hyperparameter": {**BASE_CONFIG["hyperparameter"], "end": 2}}
    with open(tmp_path / "toy.yml", "w") as f:
        yaml.dump(cfg, f)
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "-m", "shadow_gnn_tpu.main",
         "--configs", str(tmp_path / "toy.yml"), "--dataset", "toy",
         "--data_dir", str(tmp_path / "data"),
         "--log_dir", str(tmp_path / "logs"), "--seed", "1",
         "--platform", "cpu", "--device_ppr", "host"],
        capture_output=True, text=True, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert r.returncode == 0, r.stdout + r.stderr
    assert "FINAL SUMMARY:" in r.stdout
    finished = list((tmp_path / "logs" / "toy" / "finished").iterdir())
    assert len(finished) == 1


def test_cli_inference_dir(tmp_path):
    """--inference_dir on a finished run dir reloads the archived yml +
    best checkpoint and reports eval metrics (main.py inference task)."""
    g = make_synthetic_dataset(num_nodes=400, avg_deg=6, num_feat=8,
                               num_classes=4, seed=1)
    save_shadow_format(str(tmp_path / "data"), "toy", indptr=g.indptr_full,
                       indices=g.indices_full, feat=g.feat_full,
                       label=g.label_full, node_set=g.node_set)
    import yaml
    cfg = {**BASE_CONFIG,
           "hyperparameter": {**BASE_CONFIG["hyperparameter"], "end": 2}}
    with open(tmp_path / "toy.yml", "w") as f:
        yaml.dump(cfg, f)
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    common = ["--dataset", "toy", "--data_dir", str(tmp_path / "data"),
              "--log_dir", str(tmp_path / "logs"), "--platform", "cpu",
              "--device_ppr", "host"]
    r = subprocess.run(
        [sys.executable, "-m", "shadow_gnn_tpu.main",
         "--configs", str(tmp_path / "toy.yml"), "--seed", "1"] + common,
        capture_output=True, text=True, env=env, cwd=root)
    assert r.returncode == 0, r.stdout + r.stderr
    finished = list((tmp_path / "logs" / "toy" / "finished").iterdir())
    assert len(finished) == 1
    r2 = subprocess.run(
        [sys.executable, "-m", "shadow_gnn_tpu.main",
         "--inference_dir", str(finished[0])] + common,
        capture_output=True, text=True, env=env, cwd=root)
    assert r2.returncode == 0, r2.stdout + r2.stderr
    assert "PERFORM INFERENCE TASK" in r2.stdout
    # inference reproduces the trained model's eval metrics
    import re
    acc_train = re.findall(r"\[test \].*accuracy = ([0-9.]+)", r.stdout)
    acc_inf = re.findall(r"\[test \].*accuracy = ([0-9.]+)", r2.stdout)
    assert acc_train and acc_inf
    assert abs(float(acc_train[-1]) - float(acc_inf[-1])) < 1e-6


def test_packed_adj_path_matches_dense(tmp_path):
    """The fused Pallas aggregation path gives the same eval metrics as
    the dense path (interpret-mode kernel on CPU)."""
    cfg = {**BASE_CONFIG,
           "hyperparameter": {**BASE_CONFIG["hyperparameter"], "end": 1,
                              "dropout": 0.0, "dropedge": 0.0}}
    tr_dense = make_trainer(tmp_path / "a", cfg)
    tr_dense.train()
    from shadow_gnn_tpu.train.pipeline import Trainer
    from shadow_gnn_tpu.data import make_synthetic_dataset
    from shadow_gnn_tpu.train.logger import Logger
    from shadow_gnn_tpu.train.metrics import Metrics
    g = make_synthetic_dataset(num_nodes=600, avg_deg=8, num_feat=16,
                               num_classes=5, seed=3)
    parsed = parse_config(cfg)
    m = Metrics("toy", False, "accuracy", 1)
    tr_packed = Trainer("toy", str(tmp_path / "b"), g, parsed, m,
                        Logger(m, str(tmp_path / "b" / "log"), no_log=True),
                        seed=0, use_device_ppr=False, packed_adj=True)
    tr_packed.params = tr_dense.params          # same weights
    p1 = tr_dense.predict_full(modes=(TEST,))
    p2 = tr_packed.predict_full(modes=(TEST,))
    np.testing.assert_allclose(p1, p2, rtol=1e-4, atol=1e-5)


def test_fused_gat_trainer_matches_dense(tmp_path):
    """--fused_gat (Pallas masked attention, interpret mode on CPU) gives
    the same eval predictions as the dense score chain, same weights."""
    cfg = {**BASE_CONFIG,
           "architecture": {**BASE_CONFIG["architecture"], "aggr": "gat",
                            "heads": 2},
           "hyperparameter": {**BASE_CONFIG["hyperparameter"], "end": 1,
                              "dropout": 0.0, "dropedge": 0.0}}
    tr_dense = make_trainer(tmp_path / "a", cfg)
    from shadow_gnn_tpu.train.pipeline import Trainer
    from shadow_gnn_tpu.data import make_synthetic_dataset
    from shadow_gnn_tpu.train.logger import Logger
    from shadow_gnn_tpu.train.metrics import Metrics
    g = make_synthetic_dataset(num_nodes=600, avg_deg=8, num_feat=16,
                               num_classes=5, seed=3)
    parsed = parse_config(cfg)
    m = Metrics("toy", False, "accuracy", 1)
    tr_fused = Trainer("toy", str(tmp_path / "b"), g, parsed, m,
                       Logger(m, str(tmp_path / "b" / "log"), no_log=True),
                       seed=0, use_device_ppr=False, fused_gat=True)
    tr_fused.params = tr_dense.params           # same weights
    p1 = tr_dense.predict_full(modes=(TEST,))
    p2 = tr_fused.predict_full(modes=(TEST,))
    np.testing.assert_allclose(p1, p2, rtol=1e-4, atol=1e-5)


def test_meta_config_pluggable_logger(tmp_path):
    """CONFIG.yml logging.logger.name plugs a custom logger class into
    the driver (reference globals.py:29-34 dynamic logger import)."""
    import yaml
    g = make_synthetic_dataset(num_nodes=300, avg_deg=6, num_feat=8,
                               num_classes=4, seed=1)
    save_shadow_format(str(tmp_path / "data"), "toy", indptr=g.indptr_full,
                       indices=g.indices_full, feat=g.feat_full,
                       label=g.label_full, node_set=g.node_set)
    cfg = {**BASE_CONFIG,
           "hyperparameter": {**BASE_CONFIG["hyperparameter"], "end": 1}}
    with open(tmp_path / "toy.yml", "w") as f:
        yaml.dump(cfg, f)
    marker = tmp_path / "plug_marker.txt"
    (tmp_path / "myplug.py").write_text(
        "from shadow_gnn_tpu.train.logger import Logger\n\n\n"
        "class MarkerLogger(Logger):\n"
        "    def __init__(self, *a, **kw):\n"
        f"        open({str(marker)!r}, 'w').write('plugged')\n"
        "        super().__init__(*a, **kw)\n")
    meta = {"data": {"metric": {"toy": "accuracy"}},
            "logging": {"logger": {"name": "myplug:MarkerLogger"}}}
    with open(tmp_path / "CONFIG.yml", "w") as f:
        yaml.dump(meta, f)
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=str(tmp_path) + os.pathsep
               + os.environ.get("PYTHONPATH", ""))
    r = subprocess.run(
        [sys.executable, "-m", "shadow_gnn_tpu.main",
         "--configs", str(tmp_path / "toy.yml"), "--dataset", "toy",
         "--data_dir", str(tmp_path / "data"),
         "--log_dir", str(tmp_path / "logs"), "--seed", "1",
         "--platform", "cpu", "--device_ppr", "host",
         "--meta_config", str(tmp_path / "CONFIG.yml")],
        capture_output=True, text=True, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert r.returncode == 0, r.stdout + r.stderr
    assert "FINAL SUMMARY:" in r.stdout
    assert marker.read_text() == "plugged"


def test_full_sampler_mlp_training(tmp_path):
    """'full' train sampler with an adjacency-free model (sgc-style)."""
    cfg = {**BASE_CONFIG,
           "architecture": {**BASE_CONFIG["architecture"], "aggr": "mlp",
                            "feature_augment": "none"},
           "hyperparameter": {**BASE_CONFIG["hyperparameter"], "end": 3,
                              "dropedge": 0.0},
           "sampler": [{"method": "full", "phase": "train"}]}
    tr = make_trainer(tmp_path, cfg)
    tr.train()
    assert tr.logger.final_stats[TEST]["accuracy"] > 0.4


def test_cli_postproc_flows(tmp_path):
    """train -> C&S postproc -> ensemble postproc, all through the CLI."""
    import yaml
    g = make_synthetic_dataset(num_nodes=400, avg_deg=8, num_feat=8,
                               num_classes=4, seed=1)
    save_shadow_format(str(tmp_path / "data"), "toy", indptr=g.indptr_full,
                       indices=g.indices_full, feat=g.feat_full,
                       label=g.label_full, node_set=g.node_set)
    cfg = {**BASE_CONFIG,
           "hyperparameter": {**BASE_CONFIG["hyperparameter"], "end": 2},
           "sampler": [{"method": "ppr", "phase": "train", "k": [12],
                        "epsilon": [1e-5]}]}
    yaml.dump(cfg, open(tmp_path / "toy.yml", "w"))
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=os.path.dirname(os.path.dirname(
                   os.path.abspath(__file__))))
    base = [sys.executable, "-m", "shadow_gnn_tpu.main", "--dataset", "toy",
            "--data_dir", str(tmp_path / "data"),
            "--log_dir", str(tmp_path / "logs"), "--platform", "cpu",
            "--device_ppr", "device"]
    r = subprocess.run(base + ["--configs", str(tmp_path / "toy.yml"),
                               "--seed", "2"],
                       capture_output=True, text=True, env=env)
    assert r.returncode == 0, r.stdout[-1500:] + r.stderr[-1500:]
    import glob as g_
    run_dir = g_.glob(str(tmp_path / "logs" / "toy" / "finished" / "*"))[0]
    # C&S
    yaml.dump({"method": "cs", "dir_pred_mat": [run_dir],
               "hyperparameter": {"norm_sym": False, "alpha": 0.8}},
              open(tmp_path / "cs.yml", "w"))
    r2 = subprocess.run(base + ["--postproc_configs", str(tmp_path / "cs.yml")],
                        capture_output=True, text=True, env=env)
    assert r2.returncode == 0, r2.stdout[-1500:] + r2.stderr[-1500:]
    assert "C&S acc" in r2.stdout
    # ensemble
    yaml.dump({"method": "ensemble", "dir_emb_mat": {"ppr": [run_dir]},
               "architecture": {"dim": 32, "act": "leakyrelu",
                                "loss": "softmax"},
               "hyperparameter": {"lr": 0.02, "batch_size": 64, "end": 5,
                                  "dropout": 0.0},
               "repeat_per_emb": 1},
              open(tmp_path / "ens.yml", "w"))
    r3 = subprocess.run(base + ["--postproc_configs", str(tmp_path / "ens.yml")],
                        capture_output=True, text=True, env=env)
    assert r3.returncode == 0, r3.stdout[-1500:] + r3.stderr[-1500:]
    assert "post-ensemble test" in r3.stdout


def test_bf16_compute_dtype(tmp_path):
    """bf16 activations train to similar accuracy as f32."""
    from shadow_gnn_tpu.train.pipeline import Trainer
    from shadow_gnn_tpu.train.logger import Logger
    from shadow_gnn_tpu.train.metrics import Metrics
    g = make_synthetic_dataset(num_nodes=600, avg_deg=8, num_feat=16,
                               num_classes=5, seed=3)
    parsed = parse_config(BASE_CONFIG)
    m = Metrics("toy", False, "accuracy", 1)
    tr = Trainer("toy", str(tmp_path), g, parsed, m,
                 Logger(m, str(tmp_path / "log"), no_log=True), seed=0,
                 use_device_ppr=False, compute_dtype="bfloat16")
    tr.train()
    assert tr.logger.final_stats[TEST]["accuracy"] > 0.5


def test_bf16_feat_storage(tmp_path):
    """bf16 HBM feature storage: table dtype halves, arithmetic stays in
    the compute dtype (upcast after gather), accuracy unaffected."""
    import jax.numpy as jnp
    g = make_synthetic_dataset(num_nodes=600, avg_deg=8, num_feat=16,
                               num_classes=5, seed=3)
    parsed = parse_config(BASE_CONFIG)
    m = Metrics("toy", False, "accuracy", 1)
    tr = Trainer("toy", str(tmp_path), g, parsed, m,
                 Logger(m, str(tmp_path / "log"), no_log=True), seed=0,
                 use_device_ppr=False, feat_dtype="bfloat16")
    assert tr.feat_tab.dtype == jnp.bfloat16
    tr.train()
    assert tr.logger.final_stats[TEST]["accuracy"] > 0.5
    with pytest.raises(ValueError):
        Trainer("toy", str(tmp_path), g, parsed, m,
                Logger(m, str(tmp_path / "log2"), no_log=True), seed=0,
                use_device_ppr=False, feat_dtype="float16")


def test_reference_yml_drives_training(tmp_path):
    """An unmodified reference config yml (flickr flagship) drives this
    framework on a synthetic graph."""
    path = "/root/reference/config_train/flickr/vanilla/sage_3_ppr.yml"
    if not os.path.isfile(path):
        pytest.skip("reference configs unavailable")
    parsed = parse_config(path)
    parsed["params_train"]["end"] = 2            # shorten for CI
    parsed["config_data"]["to_undirected"] = False
    parsed["config_data"]["transductive"] = True
    g = make_synthetic_dataset(num_nodes=500, avg_deg=8, num_feat=16,
                               num_classes=5, seed=3)
    m = Metrics("toy", False, "accuracy", 1)
    logger = Logger(m, str(tmp_path / "log"), no_log=True)
    # shrink k for test speed while keeping the config's structure
    parsed["config_sampler_train"]["configs"][0]["k"] = [16]
    tr = Trainer("toy", str(tmp_path), g, parsed, m, logger, seed=0,
                 use_device_ppr=False)
    assert tr.model_cfg.aggr == "sage" and tr.model_cfg.num_layers == 3
    assert tr.model_cfg.dropout == 0.45 and tr.model_cfg.dropedge == 0.05
    tr.train()
    assert tr.logger.final_stats[TEST]["accuracy"] > 0.3


def test_multirun_wrapper(tmp_path):
    """scripts/train_multiple_runs.py aggregates FINAL SUMMARY lines."""
    import yaml
    g = make_synthetic_dataset(num_nodes=300, avg_deg=6, num_feat=8,
                               num_classes=3, seed=1)
    save_shadow_format(str(tmp_path / "data"), "toy", indptr=g.indptr_full,
                       indices=g.indices_full, feat=g.feat_full,
                       label=g.label_full, node_set=g.node_set)
    cfg = {**BASE_CONFIG,
           "hyperparameter": {**BASE_CONFIG["hyperparameter"], "end": 1},
           "sampler": [{"method": "ppr", "phase": "train", "k": [8],
                        "epsilon": [1e-5]}]}
    yaml.dump(cfg, open(tmp_path / "toy.yml", "w"))
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=os.path.dirname(os.path.dirname(
                   os.path.abspath(__file__))))
    r = subprocess.run(
        [sys.executable, "scripts/train_multiple_runs.py",
         "--repetition", "2", "--configs", str(tmp_path / "toy.yml"),
         "--dataset", "toy", "--data_dir", str(tmp_path / "data"),
         "--log_dir", str(tmp_path / "logs"),
         "--platform", "cpu", "--device_ppr", "device"],
        capture_output=True, text=True, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert r.returncode == 0, r.stdout[-1500:] + r.stderr[-1500:]
    assert "AGGREGATE over 2 runs" in r.stdout
    assert "test   accuracy" in r.stdout or "accuracy" in r.stdout


def test_mixed_method_ensemble(tmp_path):
    """Ensemble mixing a deterministic ppr branch (cached) with a
    stochastic khop branch (resampled each step)."""
    cfg = {**BASE_CONFIG,
           "sampler": [
               {"method": "ppr", "phase": "train", "k": [12],
                "epsilon": [1e-5]},
               {"method": "khop", "phase": "train", "depth": [2],
                "budget": [4]},
           ],
           "hyperparameter": {**BASE_CONFIG["hyperparameter"], "end": 2}}
    tr = make_trainer(tmp_path, cfg)
    assert tr.num_ensemble == 2
    tr.train()
    from shadow_gnn_tpu import TRAIN as _TR
    assert tr.caches[_TR][0] is not None     # ppr branch cached
    assert tr.caches[_TR][1] is None         # khop branch not cached
    assert tr.logger.final_stats[TEST]["accuracy"] > 0.3


def make_inductive_raw(tmp_path, num_nodes=500, num_feat=8, num_classes=4,
                       seed=2):
    """Synthetic inductive dataset: adj_train = edges among train nodes."""
    g = make_synthetic_dataset(num_nodes=num_nodes, avg_deg=8,
                               num_feat=num_feat, num_classes=num_classes,
                               seed=seed)
    tr_nodes = g.node_set[TRAIN]
    in_train = np.zeros(g.num_nodes, bool)
    in_train[tr_nodes] = True
    deg = np.diff(g.indptr_full)
    src = np.repeat(np.arange(g.num_nodes), deg)
    keep = in_train[src] & in_train[g.indices_full]
    src_k, dst_k = src[keep], g.indices_full[keep]
    indptr_tr = np.zeros(g.num_nodes + 1, np.int64)
    np.add.at(indptr_tr, src_k + 1, 1)
    indptr_tr = np.cumsum(indptr_tr).astype(np.int32)
    save_shadow_format(str(tmp_path / "data"), "toy", indptr=g.indptr_full,
                       indices=g.indices_full, feat=g.feat_full,
                       label=g.label_full, node_set=g.node_set,
                       indptr_train=indptr_tr,
                       indices_train=dst_k.astype(np.int32))
    return load_data(str(tmp_path / "data"), "toy",
                     {"to_undirected": False, "transductive": False})


def test_inductive_training(tmp_path):
    """Inductive setting: TRAIN samples over adj_train, eval over
    adj_full (reference main.py:64 / loader.py:80-95)."""
    raw = make_inductive_raw(tmp_path)
    assert not raw.is_transductive
    from shadow_gnn_tpu.train.logger import Logger
    from shadow_gnn_tpu.train.metrics import Metrics
    parsed = parse_config({**BASE_CONFIG,
                           "data": {"transductive": False},
                           "hyperparameter": {
                               **BASE_CONFIG["hyperparameter"], "end": 2}})
    m = Metrics("toy", False, "accuracy", 1)
    tr = Trainer("toy", str(tmp_path), raw, parsed, m,
                 Logger(m, str(tmp_path / "log"), no_log=True), seed=0,
                 use_device_ppr=False)
    assert tr.graph[TRAIN].num_edges < tr.graph[TEST].num_edges
    tr.train()
    assert tr.logger.final_stats[TEST]["accuracy"] > 0.3


def test_inductive_smoothening(tmp_path):
    """Inductive per-mode smoothening (reference preproc.py:167-202):
    TRAIN rows smoothed over adj_train, VALID/TEST rows over adj_full,
    rows outside every split stay zero."""
    raw = make_inductive_raw(tmp_path)
    parsed = parse_config({**BASE_CONFIG,
                           "data": {"transductive": False},
                           "architecture": {**BASE_CONFIG["architecture"],
                                            "use_label": "no_valid",
                                            "feature_smoothen": "sym-2-concat"},
                           "hyperparameter": {
                               **BASE_CONFIG["hyperparameter"], "end": 2}})
    from shadow_gnn_tpu.train.logger import Logger
    from shadow_gnn_tpu.train.metrics import Metrics
    from shadow_gnn_tpu.train.preproc import smooth_signal_full
    m = Metrics("toy", False, "accuracy", 1)
    tr = Trainer("toy", str(tmp_path), raw, parsed, m,
                 Logger(m, str(tmp_path / "log"), no_log=True), seed=0,
                 use_device_ppr=False)
    assert tr.dim_feat_smooth == 8 * 3       # order-2 concat
    assert tr.dim_label_smooth == 4
    feat_s = tr.feat_np[:, :tr.dim_feat_smooth]
    # oracle: full-graph and train-graph smoothening
    sm_full = smooth_signal_full(raw.indptr_full, raw.indices_full,
                                 np.asarray(raw.feat_full, np.float32),
                                 "sym", 2, "concat", {})
    sm_train = smooth_signal_full(raw.indptr_train, raw.indices_train,
                                  np.asarray(raw.feat_full, np.float32),
                                  "sym", 2, "concat", {})
    in_split = np.zeros(raw.num_nodes, bool)
    for md in (TRAIN, VALID, TEST):
        in_split[np.asarray(raw.node_set[md])] = True
    assert np.all(feat_s[~in_split] == 0)
    np.testing.assert_allclose(feat_s[raw.node_set[TRAIN]],
                               sm_train[raw.node_set[TRAIN]], atol=1e-5)
    np.testing.assert_allclose(feat_s[raw.node_set[TEST]],
                               sm_full[raw.node_set[TEST]], atol=1e-5)
    # train-graph smoothening genuinely differs from full-graph
    assert not np.allclose(sm_train[raw.node_set[TRAIN]],
                           sm_full[raw.node_set[TRAIN]])
    tr.train()
    assert tr.logger.final_stats[TEST]["accuracy"] > 0.3


def test_link_ppr_tables_shared_across_modes(tmp_path):
    """Link tasks compute the PPR table once and duplicate across modes
    (reference duplicate_modes, minibatch.py:383-389)."""
    cfg = {
        "data": {"to_undirected": False, "transductive": True},
        "architecture": {
            "dim": 16, "aggr": "sage", "loss": "sigmoid", "num_layers": 2,
            "act": "relu", "residue": "none", "pooling": "center",
        },
        "hyperparameter": {"end": 1, "lr": 0.01, "dropout": 0.0,
                           "batch_size": 16},
        "sampler": [{"method": "ppr", "phase": "train", "k": [8],
                     "epsilon": [1e-4]}],
    }
    g = make_synthetic_dataset(num_nodes=300, avg_deg=6, num_feat=8,
                               seed=4, task="link")
    parsed = parse_config(cfg)
    m = Metrics("toy", True, "hits20", 1)
    tr = Trainer("toy", "", g, parsed, m,
                 Logger(m, str(tmp_path / "log"), no_log=True), seed=0,
                 use_device_ppr=False)
    n_calls = [0]
    orig = tr._compute_ppr

    def counting(*a, **kw):
        n_calls[0] += 1
        return orig(*a, **kw)

    tr._compute_ppr = counting
    for md in (TRAIN, VALID, TEST):
        tr._ensure_tables(md)
    assert n_calls[0] == 1, f"PPR computed {n_calls[0]}x, want shared 1x"
    assert tr.tables[TRAIN][0] is tr.tables[VALID][0]


def test_negative_sample_correctness(tmp_path):
    """Vectorized negative sampler: right count, no self loops, no
    existing train edges."""
    cfg = {
        "data": {"to_undirected": False, "transductive": True},
        "architecture": {
            "dim": 16, "aggr": "sage", "loss": "sigmoid", "num_layers": 1,
            "act": "relu", "residue": "none", "pooling": "center",
        },
        "hyperparameter": {"end": 1, "lr": 0.01, "dropout": 0.0,
                           "batch_size": 16},
        "sampler": [{"method": "ppr", "phase": "train", "k": [8],
                     "epsilon": [1e-4]}],
    }
    g = make_synthetic_dataset(num_nodes=400, avg_deg=8, num_feat=8,
                               seed=9, task="link")
    parsed = parse_config(cfg)
    m = Metrics("toy", True, "hits20", 1)
    tr = Trainer("toy", "", g, parsed, m,
                 Logger(m, str(tmp_path / "log"), no_log=True), seed=0,
                 use_device_ppr=False)
    neg = tr._negative_sample(500)
    assert neg.shape == (500, 2)
    assert (neg[:, 0] != neg[:, 1]).all()
    indptr, indices = tr._host_adj[TRAIN]
    for u, v in neg[:100]:
        row = indices[indptr[u]:indptr[u + 1]]
        assert v not in row, (u, v)


def test_eval_train_every_and_provenance(tmp_path):
    """C21 closures: train-metric subsampling flag + checkpoint
    provenance copy on cross-run load."""
    import glob
    cfg = dict(BASE_CONFIG)
    cfg["hyperparameter"] = dict(cfg["hyperparameter"], end=2)
    tr = make_trainer(tmp_path / "a", cfg)
    tr.eval_train_every = 2
    tr.train()
    # runs end-to-end with subsampled train metrics
    assert TEST in tr.logger.final_stats
    ckpts = sorted(glob.glob(str(tmp_path / "a" / "log" /
                                 "saved_model_*.msgpack")))
    assert ckpts
    # provenance: loading that checkpoint into a new run copies it there
    cfg2 = dict(cfg)
    cfg2["hyperparameter"] = dict(cfg["hyperparameter"], end=1,
                                  retrain_dir=str(tmp_path / "a" / "log"))
    tr2 = make_trainer(tmp_path / "b", cfg2)
    loaded = glob.glob(str(tmp_path / "b" / "log" / "loaded_*.msgpack"))
    assert loaded, "cross-run load must leave a provenance copy"


def test_final_train_eval_zeroes_labels(tmp_path):
    """use_label configs: the final TRAIN-split eval pass must zero the
    label-input features like the reference (models.py:182-183 keys the
    zeroing on mode==TRAIN, not on the train/eval status)."""
    cfg = {
        "data": {"to_undirected": False, "transductive": True},
        "architecture": {
            "dim": 32, "aggr": "sage", "loss": "softmax", "num_layers": 2,
            "act": "relu", "residue": "none", "pooling": "center",
            "use_label": "all",
        },
        "hyperparameter": {"end": 2, "lr": 0.01, "dropout": 0.0,
                           "batch_size": 32},
        "sampler": [{"method": "ppr", "phase": "train", "k": [16],
                     "epsilon": [1e-5]}],
    }
    tr = make_trainer(tmp_path, cfg)
    assert tr.dim_label_smooth > 0

    # ``mode_train`` is TRACED into the (shared) eval chunk program, so
    # spy at the dispatch boundary where it is a concrete device scalar
    orig = tr._chunk_fn
    seen = []

    def spy_chunk(mode, train):
        fn, kinds = orig(mode, train)
        if train:
            return fn, kinds

        def wrapper(params, rng, mt, graph, feat_tab, xs):
            seen.append(bool(mt))
            return fn(params, rng, mt, graph, feat_tab, xs)
        return wrapper, kinds

    tr._chunk_fn = spy_chunk
    tr.run_epoch(0, TRAIN, status="final")
    assert seen and all(seen), \
        "final TRAIN eval must run with mode_train=True (label zeroing)"
    seen.clear()
    # and a VALID final pass must NOT zero (mode != TRAIN)
    tr.run_epoch(0, VALID, status="final")
    assert seen and not any(seen)
    # the traced flag means BOTH passes hit the same compiled program
    eval_fns = [k for k in tr._epoch_fns if k[0] is False]
    assert len(eval_fns) == 1


def test_embed_full_chunked_matches_direct(tmp_path):
    """embed_full (chunked scan program) reproduces the per-batch direct
    forward on every valid root, across modes and chunk boundaries."""
    import jax
    cfg = dict(BASE_CONFIG)
    tr = make_trainer(tmp_path, cfg)
    tr.chunk_batches = 2          # force several chunks incl. a padded one
    embs = tr.embed_full(modes=(TRAIN, VALID, TEST))
    assert embs[0].shape == (tr.num_nodes, tr.model_cfg.dim)

    model = tr.model
    for md in (VALID, TEST):      # eval-mode ppr sampling is deterministic
        (nb, roots, rows, _l, _w, _ln, w_np) = tr._epoch_arrays(md)
        w_np = w_np.reshape(nb, -1)
        arrays = tr._mode_arrays(md)

        @jax.jit
        def direct(params, r, rw):
            batches, feats = tr._sample_branch_batches(
                md, r, rw, jax.random.PRNGKey(0), arrays)
            _, emb_ens = model.apply(params, batches, feats,
                                     mode_train=(md == TRAIN), train=False)
            return emb_ens

        for ib in range(nb):
            emb_ens = direct(tr.params, roots[ib], rows[ib])
            r = np.asarray(roots[ib])[:, 0]
            valid = w_np[ib] > 0
            for i, e in enumerate(emb_ens):
                np.testing.assert_allclose(
                    embs[i][r[valid]], np.asarray(e)[valid],
                    rtol=1e-5, atol=1e-5)


def test_point_query_serving_api(tmp_path):
    """predict_nodes/embed_nodes: match the epoch-path predictions,
    share compiled programs across request sizes via buckets, and
    reject ids outside the mode's PPR target set."""
    tr = make_trainer(tmp_path, BASE_CONFIG)
    pred_mat = tr.predict_full(modes=(TEST,))
    test_ids = np.asarray(tr.entity_set[TEST], dtype=np.int64)

    # point queries reproduce the full-epoch prediction matrix
    ids = test_ids[[0, 3, 7]]
    probs = tr.predict_nodes(ids, mode=TEST)
    assert probs.shape == (3, tr.num_classes)
    np.testing.assert_allclose(probs, pred_mat[ids], rtol=1e-5, atol=1e-5)

    # embeddings: right shape, consistent with a repeated query
    embs = tr.embed_nodes(ids, mode=TEST)
    assert len(embs) == tr.num_ensemble
    assert embs[0].shape == (3, tr.model_cfg.dim)
    embs2 = tr.embed_nodes(ids[::-1], mode=TEST)
    np.testing.assert_allclose(embs[0], embs2[0][::-1], rtol=1e-5, atol=1e-5)

    # request sizes 1..8 share one bucket (single compiled signature)
    import jax
    n_traces = []
    for b in (1, 5, 8):
        _ = tr.predict_nodes(test_ids[:b], mode=TEST)
        n_traces.append(tr._serve_fn(TEST)._cache_size())
    assert n_traces == [1, 1, 1]

    # ids not covered by the mode's tables are rejected with context
    uncovered = np.setdiff1d(np.arange(tr.num_nodes), test_ids)
    if uncovered.size:
        with pytest.raises(ValueError, match="not covered"):
            tr.predict_nodes(uncovered[:1], mode=TEST)


def test_epoch_program_has_no_large_constants(tmp_path):
    """Every large buffer (graph CSR, feature table, PPR tables, caches)
    must reach the epoch program as an ARGUMENT: this backend serializes
    closure-captured constants into the compiled program (multi-minute
    compiles; at 10M nodes the 5.12 GB feature table broke the
    remote-compile transport).  Guard: the lowered train-epoch module
    contains no dense constant bigger than 1024 elements."""
    import math
    import re
    import jax
    from shadow_gnn_tpu import TRAIN

    tr = make_trainer(tmp_path, BASE_CONFIG)
    tr._ensure_tables(TRAIN)
    nb, roots, rows, labels, w, *_ = tr._epoch_arrays(TRAIN)
    fn = tr._make_epoch_fn(TRAIN, nb, True)
    arrays = tr._mode_arrays(TRAIN)
    low = fn.lower(tr.params, tr.opt_state, jax.random.PRNGKey(0),
                   roots, rows, labels, w, arrays)
    txt = low.as_text()
    shapes = re.findall(r"stablehlo\.constant dense<[^>]*> : tensor<([^>]+)>",
                        txt)
    assert shapes, "no constants found — lowering text format changed?"

    def numel(shape):
        dims = [int(x) for x in shape.split("x")[:-1] if x.isdigit()]
        return math.prod(dims) if dims else 1

    big = [(numel(s), s) for s in shapes if numel(s) > 1024]
    assert not big, f"graph-sized constants captured into the program: {big}"
