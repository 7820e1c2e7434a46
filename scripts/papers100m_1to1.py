"""papers100M at 1:1 scale — MEASURED, not projected (VERDICT r4 next #1).

This host matches the reference's documented papers100M machine
(`/root/reference/README.md:79-86`: >=4 CPU cores, 128 GB RAM; this
box: 4 cores, 125 GB).  The harness builds a synthetic power-law graph
at the REAL ogbn-papers100M shape — 111,059,956 nodes and ~1.6e9
stored (symmetric) edges — and measures every stage of the leaderboard
pipeline (`config_train/papers100M/leaderboard/gat_ppr.yml`: PPR k=400,
eps=1e-5, threshold 0.002, batch 64) at full scale:

  --phase gen   host graph build -> tmp/papers1to1/{indptr,indices}.npy
                (int64 indptr + int32 indices, the on-disk CSR a real
                papers100M conversion produces; ~7.3 GB)
  --phase ppr   native forward-push PPR precompute for the REAL train
                split size (1,207,179 targets), reference-format bin
                cache write + read-back verify, induction sizing via
                the production planner (sampling/induction.
                plan_ppr_induction — the same code Trainer uses)
  --phase tpu   load the CSR into one chip's HBM (~7.3 GB CSR +
                ~3.9 GB top-k tables), run sample-only and
                sample+induce epochs over all 1.2M targets at k=400,
                batch 64 — the measurement the 10M-proxy numbers
                (BENCH.md "10M-node graph") projected until now
  --phase refbins  export the CSR in the reference backend's raw-bin
                layout (`ParallelSampler.cpp:70-86` read_array_from_bin)
                so the UNMODIFIED reference engine can be timed on the
                same graph without pybind vector copies

Each phase prints one JSON line; phases persist artifacts under
tmp/papers1to1/ so they can run in separate processes (gen+ppr on the
CPU, tpu against the real chip).
"""
import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_PAPERS = 111_059_956
N_TRAIN_TARGETS = 1_207_179
E_PAIRS = 800_000_000          # undirected pairs -> ~1.6e9 stored edges
K = 400
ALPHA = 0.85
EPS = 1e-5
THRESHOLD = 0.002
BATCH = 64
WORK = os.path.join(REPO, "tmp", "papers1to1")


def _zipf_nodes(rng, size, n):
    """Endpoint sample with weight (i+1)^-0.75 via inverse CDF
    (same family as data/synthetic.make_random_graph power_law, whose
    rng.choice(p=...) does not scale to 1.6e9 draws)."""
    u = rng.random(size)
    return np.minimum((u ** 4 * n).astype(np.int64), n - 1)


def phase_gen(n, e_pairs, seed=0):
    os.makedirs(WORK, exist_ok=True)
    t0 = time.time()
    rng = np.random.default_rng(seed)
    # encoded symmetric edge list: key = u * n + v for both directions
    key = np.empty(2 * e_pairs, np.int64)
    chunk = 50_000_000
    w = 0
    for lo in range(0, e_pairs, chunk):
        m = min(chunk, e_pairs - lo)
        u = _zipf_nodes(rng, m, n)
        v = _zipf_nodes(rng, m, n)
        keep = u != v
        u, v = u[keep], v[keep]
        key[w:w + u.size] = u * n + v
        key[w + u.size:w + 2 * u.size] = v * n + u
        w += 2 * u.size
        print(f"[gen] {min(lo + chunk, e_pairs)}/{e_pairs} pairs "
              f"({time.time() - t0:.0f}s)", file=sys.stderr, flush=True)
    key = key[:w]
    t1 = time.time()
    key.sort(kind="stable")
    print(f"[gen] sorted {w} keys in {time.time() - t1:.0f}s",
          file=sys.stderr, flush=True)
    # dedup consecutive equal keys (duplicate sampled pairs)
    mask = np.empty(key.size, bool)
    mask[0] = True
    np.not_equal(key[1:], key[:-1], out=mask[1:])
    key = key[mask]
    del mask
    e = key.size
    indices = (key % n).astype(np.int32)
    # row counts -> indptr, chunked to bound the bincount temporaries
    counts = np.zeros(n, np.int64)
    for lo in range(0, e, chunk):
        rows = (key[lo:lo + chunk] // n).astype(np.int64)
        counts += np.bincount(rows, minlength=n)
    del key
    indptr = np.empty(n + 1, np.int64)
    indptr[0] = 0
    np.cumsum(counts, out=indptr[1:])
    deg_max = int(counts.max())
    deg_mean = float(counts.mean())
    del counts
    np.save(os.path.join(WORK, "indptr.npy"), indptr)
    np.save(os.path.join(WORK, "indices.npy"), indices)
    out = {
        "phase": "gen", "nodes": n, "stored_edges": e,
        "deg_max": deg_max, "deg_mean": round(deg_mean, 2),
        "csr_bytes": int(indptr.nbytes + indices.nbytes),
        "gen_s": round(time.time() - t0, 1),
    }
    print(json.dumps(out), flush=True)
    return out


def _load_csr():
    indptr = np.load(os.path.join(WORK, "indptr.npy"), mmap_mode="r")
    indices = np.load(os.path.join(WORK, "indices.npy"), mmap_mode="r")
    return indptr, indices


def _targets(n, n_targets, seed=1):
    rng = np.random.default_rng(seed)
    perm = rng.permutation(n)[:n_targets]
    return np.sort(perm).astype(np.int64)


def phase_ppr(n_targets):
    from shadow_gnn_tpu.native import ppr_push_native
    from shadow_gnn_tpu.sampling import ppr as ppr_mod
    from shadow_gnn_tpu.sampling.batch import default_n_pad
    from shadow_gnn_tpu.sampling.induction import plan_ppr_induction

    indptr, indices = _load_csr()
    n = indptr.size - 1
    # materialize in RAM: the push random-accesses the whole CSR
    t0 = time.time()
    indptr = np.ascontiguousarray(indptr, np.int64)
    indices = np.ascontiguousarray(indices, np.int32)
    t_load = time.time() - t0
    targets = _targets(n, n_targets)

    t0 = time.time()
    tab_n, tab_s = ppr_push_native(indptr, indices, targets, K,
                                   1 - ALPHA, EPS, as_dense=True)
    t_push = time.time() - t0
    rate = n_targets / t_push
    print(f"[ppr] {n_targets} targets in {t_push:.0f}s = {rate:.0f}/s",
          file=sys.stderr, flush=True)
    np.save(os.path.join(WORK, "tab_n.npy"), tab_n)
    np.save(os.path.join(WORK, "tab_s.npy"), tab_s)
    np.save(os.path.join(WORK, "targets.npy"), targets)

    # reference-contract bin cache (ppr_float/<neighs|scores>_...bin)
    d = os.path.join(WORK, "papers100M")
    fn, fs = ppr_mod.ppr_cache_paths(WORK, "papers100M", True, "train",
                                     ALPHA, EPS, K)
    os.makedirs(os.path.dirname(fn), exist_ok=True)
    t0 = time.time()
    ppr_mod.write_ppr_cache(fn, fs, n, targets, tab_n, tab_s, K, ALPHA, EPS)
    t_write = time.time() - t0
    cache_bytes = os.path.getsize(fn) + os.path.getsize(fs)
    t0 = time.time()
    back = ppr_mod.read_ppr_cache(fn, fs, K, ALPHA, EPS)
    assert back is not None
    nv, sv = back
    t_read = time.time() - t0
    rng = np.random.default_rng(3)
    for i in rng.choice(n_targets, 10, replace=False):
        t = int(targets[i])
        valid = tab_n[i] >= 0
        np.testing.assert_array_equal(nv[t], tab_n[i][valid])
        np.testing.assert_allclose(sv[t], tab_s[i][valid], rtol=1e-6)
    del nv, sv, back

    # production induction sizing (the same planner Trainer uses)
    deg = np.diff(indptr)
    scope_deg = (deg[np.clip(tab_n, 0, n - 1)] * (tab_n >= 0))
    root_deg = deg[targets]
    n_pad = default_n_pad({"method": "ppr", "k": K})
    plan = plan_ppr_induction(scope_deg, root_deg, n_pad=n_pad,
                              num_targets=1, batch_size=BATCH,
                              undirected=True,
                              row_block=128 if indices.size >= 2**28
                              else 32)
    with open(os.path.join(WORK, "plan.json"), "w") as f:
        json.dump(plan, f)
    out = {
        "phase": "ppr", "nodes": int(n), "targets": n_targets, "k": K,
        "epsilon": EPS, "alpha": ALPHA,
        "csr_load_s": round(t_load, 1),
        "push_s": round(t_push, 1),
        "push_targets_per_s": round(rate, 1),
        "cache_write_s": round(t_write, 1),
        "cache_read_s": round(t_read, 1),
        "cache_bytes": cache_bytes,
        "scope_nodes_mean": round(float((tab_n >= 0).sum(1).mean()), 1),
        "induction_plan": plan,
    }
    print(json.dumps(out), flush=True)
    return out


def phase_tpu(n_roots, epochs):
    import functools
    import jax
    import jax.numpy as jnp
    from shadow_gnn_tpu.data.graph import DeviceGraph
    from shadow_gnn_tpu.sampling.batch import SamplerConfig, default_n_pad
    from shadow_gnn_tpu.sampling.samplers import (PPRTables, sample_nodes_ppr,
                                                  sample_subgraphs)

    indptr, indices = _load_csr()
    n = indptr.size - 1
    with open(os.path.join(WORK, "plan.json")) as f:
        plan = json.load(f)
    tab_n = np.load(os.path.join(WORK, "tab_n.npy"), mmap_mode="r")
    tab_s = np.load(os.path.join(WORK, "tab_s.npy"), mmap_mode="r")
    targets = np.load(os.path.join(WORK, "targets.npy"))
    n_pad = default_n_pad({"method": "ppr", "k": K})
    # add_self_edge matches the gat architecture of the leaderboard yml
    # (utils.py:126-131 auto-forces it); hops aug likewise
    cfg = SamplerConfig(method="ppr", n_pad=n_pad, k=K, alpha=ALPHA,
                        epsilon=EPS, threshold=THRESHOLD,
                        add_self_edge=True, aug_feats=("hops",), **plan)
    dev = jax.devices()[0]
    print(f"[tpu] platform={dev.platform} plan={plan}", file=sys.stderr,
          flush=True)

    t0 = time.time()
    graph = DeviceGraph.from_csr(np.asarray(indptr), np.asarray(indices))
    tabs = PPRTables(jnp.asarray(np.asarray(tab_n)),
                     jnp.asarray(np.asarray(tab_s)))
    jax.block_until_ready((graph.indptr, graph.indices, tabs))
    t_h2d = time.time() - t0
    hbm_bytes = (graph.indptr.nbytes + graph.indices.nbytes
                 + tabs.neighs.nbytes + tabs.scores.nbytes)
    print(f"[tpu] CSR+tables resident: {hbm_bytes / 1e9:.2f} GB "
          f"in {t_h2d:.1f}s", file=sys.stderr, flush=True)

    if n_roots <= 0 or n_roots > targets.size:
        n_roots = targets.size
    # ONE compiled program = a 1024-batch scan; the full 1.2M-root
    # epoch iterates it over chunks (the production Trainer dispatches
    # chunked epochs too, pipeline chunk_batches).  A single
    # 18,862-step scan program reproducibly crashes the tunnel's TPU
    # worker during compilation at this operand scale.
    chunk_nb = min(1024, n_roots // BATCH)
    nb = (n_roots // (BATCH * chunk_nb)) * chunk_nb
    n_chunks = nb // chunk_nb
    rng_np = np.random.default_rng(11)
    perm = rng_np.permutation(targets.size)[:nb * BATCH]
    # [n_chunks, chunk_nb, B, T=1]: sample_nodes_ppr/induce take [B, T]
    roots = jnp.asarray(targets[perm].reshape(n_chunks, chunk_nb, BATCH, 1)
                        .astype(np.int32))
    rows = jnp.asarray(perm.reshape(n_chunks, chunk_nb, BATCH, 1)
                       .astype(np.int32))

    def body(stage, gr, tabs, carry, xs):
        rng = carry
        roots_b, rows_b = xs
        rng, sub = jax.random.split(rng)
        if stage == "sample":
            nodes, sc = sample_nodes_ppr(cfg, gr, roots_b, rows_b, tabs)
            return rng, (nodes.sum(), sc.sum())
        b = sample_subgraphs(cfg, gr, roots_b, rng=sub, table_rows=rows_b,
                             tables=tabs)
        return rng, (b.adj.sum(), b.hop.sum() + b.size.sum())

    def mk(stage):
        @jax.jit
        def ep(rng, roots, rows, gr, tabs):
            return jax.lax.scan(functools.partial(body, stage, gr, tabs),
                                rng, (roots, rows))
        return ep

    out = {
        "phase": "tpu", "platform": dev.platform, "nodes": int(n),
        "stored_edges": int(indices.size), "k": K, "batch": BATCH,
        "roots_per_epoch": nb * BATCH, "n_pad": n_pad,
        "induction_plan": plan,
        "h2d_s": round(t_h2d, 1),
        "hbm_resident_gb": round(hbm_bytes / 1e9, 2),
    }
    rng = jax.random.PRNGKey(0)

    def run_epoch(ep):
        t1 = time.time()
        acc = 0.0
        for c in range(n_chunks):
            _, o = ep(rng, roots[c], rows[c], graph, tabs)
            acc += float(o[0].sum())
        return time.time() - t1

    for stage in ("sample", "induce"):
        ep = mk(stage)
        t0 = time.time()
        _, o = ep(rng, roots[0], rows[0], graph, tabs)
        _ = float(o[0].sum())
        t_compile = time.time() - t0
        times = []
        for _ in range(epochs):
            times.append(run_epoch(ep))
            print(f"[tpu] {stage} epoch: {times[-1]:.1f}s",
                  file=sys.stderr, flush=True)
        t_med = float(np.median(times))
        spread = (max(times) - min(times)) / t_med if len(times) > 1 else 0.0
        out[f"{stage}_epoch_s"] = round(t_med, 2)
        out[f"{stage}_epoch_spread"] = round(spread, 3)
        out[f"{stage}_subg_per_s"] = round(nb * BATCH / t_med, 1)
        out[f"{stage}_first_epoch_incl_compile_s"] = round(t_compile, 1)
        print(f"[tpu] {stage}: {out[f'{stage}_subg_per_s']} subg/s "
              f"(epoch {t_med:.1f}s, spread {spread:.1%})",
              file=sys.stderr, flush=True)
    print(json.dumps(out), flush=True)
    return out


def phase_refbins():
    """Export the reference backend's raw-bin CSR layout (headerless
    little-endian uint32, empty data file = all-ones weights —
    ``ParallelSampler.cpp:70-86`` reads, our ``format.write_bin_csr``
    writes the same contract the A/B harness already proves) so the
    unmodified C++ engine loads the same 111M-node graph without pybind
    vector copies.  indptr values fit uint32: 1.58e9 < 2^32."""
    from shadow_gnn_tpu.data.format import write_bin_csr

    indptr, indices = _load_csr()
    d = os.path.join(WORK, "papers100M", "cpp")
    t0 = time.time()
    write_bin_csr(d, "full", "undirected", np.asarray(indptr),
                  np.asarray(indices))
    total = sum(os.path.getsize(os.path.join(d, f)) for f in os.listdir(d))
    out = {"phase": "refbins", "bytes": total,
           "write_s": round(time.time() - t0, 1), "dir": d}
    print(json.dumps(out), flush=True)
    return out


def phase_train(n_roots, epochs, feat_dim=8):
    """FULL TRAINING at 1:1 scale through the PRODUCTION Trainer:
    the leaderboard architecture (GAT-3 dim 800 heads 4, prelu,
    residue max / max pooling, hops aug, dropout 0.35 dropedge 0.1,
    batch 64, PPR k=400 threshold 0.002) over the 111M-node /
    1.58B-edge CSR on ONE chip — sample + induce + forward + backward
    + Adam every step (the cache exceeds budget at this scale, so the
    cold path runs, like the verbatim CLI run).  Features are
    synthetic ``feat_dim``-dim bf16 (the real 128-dim table is 28 GB
    bf16 — the edge-partitioned path's ledger covers that); the PPR
    bin cache written by --phase ppr is discovered and read back
    instead of recomputed."""
    import jax
    from shadow_gnn_tpu import TRAIN
    from shadow_gnn_tpu.data.graph import RawGraph
    from shadow_gnn_tpu.train.config import parse_config
    from shadow_gnn_tpu.train.logger import Logger
    from shadow_gnn_tpu.train.metrics import Metrics
    from shadow_gnn_tpu.train.pipeline import Trainer

    indptr, indices = _load_csr()
    n = indptr.size - 1
    indptr = np.ascontiguousarray(indptr, np.int64)
    indices = np.ascontiguousarray(indices, np.int32)
    targets = np.load(os.path.join(WORK, "targets.npy"))
    rng = np.random.default_rng(5)
    feat = np.empty((n, feat_dim), np.float32)
    comm = rng.integers(0, 16, size=n).astype(np.int32)
    centers = rng.normal(size=(16, feat_dim)).astype(np.float32)
    chunk = 10_000_000
    for lo in range(0, n, chunk):
        hi = min(lo + chunk, n)
        feat[lo:hi] = (centers[comm[lo:hi]]
                       + rng.normal(size=(hi - lo, feat_dim))
                       .astype(np.float32))
    label = (comm % 8).astype(np.int64)
    tr_t = targets[:n_roots]
    rest = targets[n_roots:]
    raw = RawGraph(indptr_full=indptr, indices_full=indices,
                   indptr_train=None, indices_train=None,
                   feat_full=feat, label_full=label,
                   node_set={TRAIN: tr_t, 1: rest[:1024], 2: rest[1024:2048]},
                   edge_set=None)
    cfg = {
        "data": {"transductive": True, "norm_feat": False},
        "architecture": {
            "dim": 800, "aggr": "gat", "heads": 4, "loss": "softmax",
            "num_layers": 3, "act": "prelu", "feature_augment": "hops",
            "residue": "max", "pooling": "max",
        },
        "hyperparameter": {"end": epochs, "lr": 2e-4, "dropout": 0.35,
                           "dropedge": 0.1, "batch_size": BATCH},
        "sampler": [{"method": "ppr", "phase": "train", "k": [K],
                     "threshold": [THRESHOLD], "epsilon": [EPS]}],
    }
    metrics = Metrics("papers100M", False, "accuracy", 1)
    t0 = time.time()
    tr = Trainer("papers100M", WORK, raw, parse_config(cfg), metrics,
                 Logger(metrics, "/tmp/papers1to1_train", no_log=True),
                 seed=0, feat_dtype="bfloat16", prng_impl="rbg",
                 matmul_precision="bfloat16")
    tr._ensure_tables(TRAIN)
    t_init = time.time() - t0
    print(f"[train] Trainer + tables ready in {t_init:.0f}s",
          file=sys.stderr, flush=True)
    times = []
    for e in range(epochs):
        t1 = time.time()
        tr.run_epoch(e, TRAIN)
        times.append(time.time() - t1)
        print(f"[train] epoch {e}: {times[-1]:.1f}s = "
              f"{n_roots / times[-1]:.0f} subg/s", file=sys.stderr,
              flush=True)
    sustained = times[1:] or times
    med = float(np.median(sustained))
    out = {"phase": "train", "nodes": int(n),
           "stored_edges": int(indices.size),
           "arch": "gat3_dim800_h4 (leaderboard)", "batch": BATCH,
           "roots_per_epoch": int(n_roots), "feat_dim": feat_dim,
           "init_s": round(t_init, 1),
           "first_epoch_incl_compile_s": round(times[0], 1),
           "epoch_s_median": round(med, 2),
           "train_subg_per_s": round(n_roots / med, 1),
           "raw_epoch_s": [round(t, 1) for t in times]}
    print(json.dumps(out), flush=True)
    return out


def phase_refrun(roots_n, threads):
    """The UNMODIFIED reference engine at the same 111M-node scale:
    C++ bin-file direct load (its papers100M fast path, main.py:57-64:
    adj=None + bin_adj_files), its own PPR preprocessing for
    ``roots_n`` targets, then batched sampling+extraction epochs.
    Sampling ONLY — no model — the comparator for phase tpu's
    sample+induce arm."""
    sys.path.insert(0, os.path.join(REPO, "scripts", "ref_shims"))
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    import compat
    compat.apply()
    from graph_engine.frontend.samplers_ensemble import GraphSamplerEnsemble

    d = os.path.join(WORK, "papers100M", "cpp")
    bins = {k: os.path.join(d, f"adj_full_undirected_{k}.bin")
            for k in ("indptr", "indices", "data")}
    bins["data"] = ""                       # empty file = all-ones weights
    assert os.path.isfile(bins["indptr"]), "run --phase refbins first"
    targets = np.load(os.path.join(WORK, "targets.npy"))[:roots_n]
    work_ppr = os.path.join(WORK, "refppr")
    import shutil
    shutil.rmtree(work_ppr, ignore_errors=True)
    os.makedirs(os.path.join(work_ppr, "papers100M", "ppr_float"),
                exist_ok=True)
    cfg = {"size_root": 1, "fix_target": True,
           "sequential_traversal": True,
           "method": "ppr", "k": K, "epsilon": EPS, "threshold": THRESHOLD,
           "type_": 0, "name_data": "papers100M",
           "dir_data": {"local": work_ppr, "remote": [],
                        "is_adj_changed": False},
           "is_transductive": True,
           "args_preproc": {"preproc_targets": targets,
                            "duplicate_modes": None}}
    t0 = time.time()
    ens = GraphSamplerEnsemble(None, None, [cfg], [{"hops"}],
                               max_num_threads=threads,
                               num_subg_per_batch=500,
                               bin_adj_files=bins, seed_cpp=42)
    t_init = time.time() - t0
    print(f"[refrun] engine init + PPR preproc ({targets.size} targets): "
          f"{t_init:.0f}s = {targets.size / t_init:.0f} tgt/s incl. load",
          file=sys.stderr, flush=True)
    times = []
    for e in range(3):
        ens.shuffle_targets(targets.copy().astype(np.int64))
        got = 0
        t0 = time.time()
        while got < targets.size:
            out = ens.par_sample_ensemble("node")
            got += len(out[0])
        times.append(time.time() - t0)
        print(f"[refrun] epoch {e}: {targets.size / times[-1]:.0f} subg/s",
              file=sys.stderr, flush=True)
    med = float(np.median(times))
    out = {"phase": "refrun", "nodes": N_PAPERS, "targets": int(targets.size),
           "threads": threads, "init_incl_ppr_s": round(t_init, 1),
           "epoch_s_median": round(med, 2),
           "subg_per_s": round(targets.size / med, 1),
           "raw_epoch_s": [round(t, 2) for t in times]}
    print(json.dumps(out), flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", required=True,
                    choices=["gen", "ppr", "tpu", "refbins", "refrun",
                             "train"])
    ap.add_argument("--nodes", type=int, default=N_PAPERS)
    ap.add_argument("--pairs", type=int, default=E_PAIRS)
    ap.add_argument("--targets", type=int, default=N_TRAIN_TARGETS)
    ap.add_argument("--roots", type=int, default=0,
                    help="roots per measured epoch (0 = the full target set)")
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--threads", type=int, default=4)
    args = ap.parse_args()
    if args.phase == "gen":
        phase_gen(args.nodes, args.pairs)
    elif args.phase == "ppr":
        phase_ppr(args.targets)
    elif args.phase == "refbins":
        phase_refbins()
    elif args.phase == "refrun":
        phase_refrun(args.roots or 65536, args.threads)
    elif args.phase == "train":
        phase_train(args.roots or 65536, args.epochs)
    else:
        phase_tpu(args.roots, args.epochs)


if __name__ == "__main__":
    main()
