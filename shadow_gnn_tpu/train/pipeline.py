"""End-to-end training pipeline: data -> sampler branches -> model -> loops.

The TPU-native replacement for the reference's driver + minibatch stack
(``shaDow/main.py`` instantiate/train/one_epoch + ``minibatch.py``):

* per-mode device graphs (TRAIN uses adj_train when inductive,
  main.py:64) live in HBM;
* each ensemble branch is a static `SamplerConfig`; PPR branches get
  per-mode top-k tables (precomputed host-side with the reference push
  algorithm + byte-compatible bin cache, or on-device power iteration);
* an epoch is ONE jitted program: `lax.scan` over root batches, each
  step sampling + inducing + forward/backward + Adam update entirely
  on device.  There is no host-side subgraph pool/cache: deterministic
  samplers re-derive identical subgraphs from the same tables, which
  is what the reference's record/reuse cache achieves
  (minibatch.py:306-342) without the host round-trip;
* the tail batch is padded with dummy roots and masked out of the loss
  and metrics (the reference instead shrinks the last batch).
"""
from __future__ import annotations

import os
import time
from functools import partial
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from shadow_gnn_tpu import MODE2STR, TRAIN, VALID, TEST
from shadow_gnn_tpu.data.graph import DeviceGraph, RawGraph
from shadow_gnn_tpu.nn.model import DeepGNN, ModelConfig, loss_fn, predict_fn
from shadow_gnn_tpu.sampling import ppr as ppr_mod
from shadow_gnn_tpu.sampling.batch import SamplerConfig, default_n_pad
from shadow_gnn_tpu.sampling.samplers import PPRTables, sample_subgraphs
from shadow_gnn_tpu.train.config import decouple_ensemble
from shadow_gnn_tpu.train.logger import Logger
from shadow_gnn_tpu.train.metrics import Metrics


def weighted_loss_parts(cfg: ModelConfig, logits, labels, weights):
    """(numerator, weight-sum) of the reference loss — separated so
    SPMD shards can normalize by the GLOBAL weight sum (psum of the
    denominators) instead of their local one, which diverges on tail
    batches whose padding rows land unevenly across shards."""
    if cfg.sigmoid_loss:
        lab = labels.astype(logits.dtype)
        bce = jnp.maximum(logits, 0) - logits * lab + jnp.log1p(
            jnp.exp(-jnp.abs(logits)))
        return ((bce.mean(-1) * weights).sum() * logits.shape[-1],
                weights.sum())
    if labels.ndim == 2:
        labels = labels.argmax(-1)
    logp = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    return (ce * weights).sum(), weights.sum()


def weighted_loss_fn(cfg: ModelConfig, logits, labels, weights):
    """Reference loss (models.py:156-166) with tail-batch padding masked
    via per-row weights (w in {0,1})."""
    num, den = weighted_loss_parts(cfg, logits, labels, weights)
    return num / jnp.clip(den, 1.0, None)


# The rows-induction neighbor gather materializes [B, n_pad, R, 32]
# int32, lane-padded 4x by the (8,128) tile layout — R*512 bytes per
# member with R = (deg_cap-1)//32 + 2; the canonical formula lives next
# to the gather it budgets (sampling/induction.py) and is shared with
# the cache-build chunk sizing (sampling/cache.py)
from shadow_gnn_tpu.sampling.induction import (ROWS_GATHER_BUDGET,
                                               bucket_cap,
                                               plan_ppr_induction,
                                               rows_gather_bytes)


from typing import NamedTuple


class ModeArrays(NamedTuple):
    """Per-mode device buffers passed explicitly into epoch programs."""

    indptr: Any
    indices: Any
    feat_tab: Any
    tables: tuple
    caches: tuple


class Trainer:
    def __init__(self, name_data: str, dir_data: str, raw: RawGraph,
                 parsed: Dict[str, Any], metrics: Metrics, logger: Logger,
                 seed: int = 0, use_device_ppr: Optional[bool] = None,
                 matmul_precision: Optional[str] = None,
                 packed_adj: bool = False, compute_dtype: str = "float32",
                 prng_impl: Optional[str] = None,
                 fused_gat: Optional[bool] = None,
                 feat_dtype: str = "float32", partition: str = "none",
                 partition_devices: int = 0):
        if prng_impl:
            # counter-based RBG instead of threefry for dropout/dropedge
            # mask generation: measured 31.4k -> 43.5k subgraphs/s on the
            # flagship TPU bench (threefry bit-gen was 28% of the step);
            # must be set before any key in this process is created
            jax.config.update("jax_default_prng_impl", prng_impl)
        self.name_data = name_data
        self.dir_data = dir_data
        self.metrics = metrics
        self.logger = logger
        self.arch = parsed["arch_gnn"]
        self.params_train = parsed["params_train"]
        self.sampler_cfg_train = parsed["config_sampler_train"]
        self.sampler_cfg_preproc = parsed["config_sampler_preproc"]
        self.config_data = parsed["config_data"]
        self.task = raw.prediction_task
        self.seed = seed
        self.rng_np = np.random.default_rng(seed)
        # link-task negative sampling: separate stream (prefetch thread
        # must not race rng_np) + lazily built sorted edge-key array
        self._neg_rng = np.random.default_rng(
            np.random.SeedSequence([seed, 0x9e3779b9]))
        self._neg_thread = None
        self._neg_edge_keys = None
        self.batch_size = self.sampler_cfg_train["batch_size"]
        self.is_transductive = raw.is_transductive
        # device-side full graph(s)
        self.graph = {}
        g_full = DeviceGraph.from_csr(raw.indptr_full, raw.indices_full)
        for m in (VALID, TEST):
            self.graph[m] = g_full
        if raw.indptr_train is not None:
            self.graph[TRAIN] = DeviceGraph.from_csr(raw.indptr_train,
                                                     raw.indices_train)
        else:
            self.graph[TRAIN] = g_full
        self._host_adj = {
            TRAIN: raw.adj(TRAIN), VALID: raw.adj(VALID), TEST: raw.adj(TEST)}
        self.num_nodes = raw.num_nodes
        # hub-safe induction is gated on structural undirectedness (its
        # symmetrization step assumes every edge has a reverse)
        from shadow_gnn_tpu.data.graph import is_undirected
        self.undirected = is_undirected(raw.indptr_full, raw.indices_full)
        # features / labels on device
        self.feat_np = np.asarray(raw.feat_full, dtype=np.float32)
        self.dim_feat_raw = self.feat_np.shape[1]
        self.dim_feat_smooth = self.dim_feat_raw        # preproc may widen
        self.dim_label_smooth = 0
        self.label_np = raw.label_full
        if self.task == "node":
            self.entity_set = raw.node_set
            if self.label_np.ndim == 1:
                self.num_classes = int(self.label_np[
                    ~np.isnan(self.label_np.astype(np.float64))].max()) + 1
                self.label_tab = jnp.asarray(self.label_np.astype(np.int32))
            else:
                self.num_classes = self.label_np.shape[1]
                self.label_tab = jnp.asarray(self.label_np.astype(np.float32))
        else:
            self.entity_set = raw.edge_set
            self.num_classes = 1
            self.label_tab = None
        self.num_targets = 1 + (self.task == "link")
        # preprocessing (feature/label smoothening) before the feat table
        # is frozen — widens feat_np and sets dim_label_smooth
        if (self.arch["feature_smoothen"] != "none"
                or self.arch["use_label"] != "none"):
            from shadow_gnn_tpu.train.preproc import preprocess_signals
            self.feat_np, self.dim_feat_smooth, self.dim_label_smooth = \
                preprocess_signals(self)
        # HBM feature-table storage dtype.  bfloat16 halves both the
        # resident table (papers100M scale: 111M x 128 f32 = 57 GB ->
        # 28.4 GB, i.e. ~3.6 GB/chip row-sharded on a v5e-8) and the
        # per-step gather traffic; the model upcasts to its compute
        # dtype right after the gather (model.py feat cast), so only
        # the stored features are rounded — all arithmetic is
        # unchanged.  Host-side preprocessing (smoothening, norm)
        # stays f32; rounding happens once at device upload.
        if feat_dtype not in ("float32", "bfloat16"):
            raise ValueError(f"unsupported feat_dtype {feat_dtype!r}")
        self.feat_dtype = feat_dtype
        # multi-device TRAIN epochs: 'dp' (replicated storage, GSPMD
        # gradient all-reduce), 'feat' (row-sharded feature table), or
        # 'edge' (fully edge-partitioned graph — parallel/edgepart.py).
        # Eval epochs stay on the single-program path with the updated
        # (replicated) parameters.
        if partition not in ("none", "dp", "feat", "edge"):
            raise ValueError(f"unsupported partition {partition!r}")
        self.partition = partition
        self.partition_devices = partition_devices
        self._partition_fns: Dict[int, Any] = {}
        # device-program launches for partition TRAIN epochs (the
        # epoch-scan path pays exactly ONE per epoch; per-batch paths
        # pay nb)
        self.partition_train_dispatches = 0
        self.feat_tab = jnp.asarray(
            self.feat_np,
            dtype=jnp.bfloat16 if feat_dtype == "bfloat16" else None)
        # sampler branches
        self.branches = self._build_branches()
        self.num_ensemble = len(self.branches)
        # PPR tables per (mode, branch)
        # auto: batched power iteration on an accelerator for big
        # graphs, native host push otherwise.  The device path
        # materializes [N, batch] dense iterates — right for TPU HBM
        # bandwidth, pathological on the CPU backend (and an OOM at
        # >~2M nodes on a 16 GB chip), so the auto-choice is HBM-aware
        # (ppr.plan_device_ppr): it shrinks the block when near the
        # limit and falls back to the native push beyond it.
        dev0 = jax.devices()[0]
        self._hbm_bytes = ppr_mod.device_memory_bytes(dev0)
        auto_dev, _ = ppr_mod.plan_device_ppr(
            self.num_nodes, int(self.graph[TRAIN].num_edges),
            self._hbm_bytes)
        self.use_device_ppr = (use_device_ppr if use_device_ppr is not None
                               else auto_dev)
        self.tables: Dict[int, List[Optional[PPRTables]]] = {}
        # device subgraph cache (deterministic samplers only; the
        # reference's record/reuse machinery, minibatch.py:306-342).
        # link tasks never cache (minibatch.py:213).
        self.caches: Dict[int, list] = {}
        self.nocache_modes = set() if self.task == "node" else {TRAIN, VALID,
                                                                TEST}
        self.cache_budget_bytes = 2 << 30
        # model
        self.model_cfg = ModelConfig(
            dim_feat_raw=self.dim_feat_raw,
            dim_feat_smooth=self.dim_feat_smooth,
            dim_label_raw=self.num_classes,
            dim_label_smooth=self.dim_label_smooth,
            aggr=self.arch["aggr"],
            num_layers=self.arch["num_layers"],
            dim=self.arch["dim"],
            act=self.arch["act"],
            layer_norm=self.arch["layer_norm"],
            heads=int(self.arch["heads"]),
            residue=self.arch["residue"],
            pooling=self.arch["pooling"],
            loss=self.arch["loss"],
            num_cls_layers=self.arch["num_cls_layers"],
            feature_augment=tuple(self.arch["feature_augment"]),
            feature_augment_ops=self.arch["feature_augment_ops"],
            num_ensemble=self.num_ensemble,
            branch_sharing=self.arch["branch_sharing"],
            ensemble_act=self.arch["ensemble_act"],
            ensemble_dropout=self.params_train.get("ensemble_dropout", "none"),
            prediction_task=self.task,
            dropout=float(self.params_train["dropout"]),
            dropedge=float(self.params_train.get("dropedge", 0.0)),
            packed_adj=packed_adj,
            # auto: the fused masked-attention kernel measured 1.75x /
            # 1.25x over the dense chain at the products/papers
            # leaderboard shapes (BENCH.md round 4) — default it ON for
            # gat/gatscat on TPU.  Only TPU: the kernel is written
            # against TPU lowering rules (pallas tpu module, (8,128)
            # tiles) and unvalidated on other accelerators; CPU keeps
            # the dense chain (interpret mode is orders slower)
            fused_gat=(fused_gat if fused_gat is not None
                       else (self.arch["aggr"] in ("gat", "gatscat")
                             and jax.devices()[0].platform
                             in ("tpu", "axon"))),
            compute_dtype=compute_dtype,
        )
        self.model = DeepGNN(self.model_cfg)
        self.params = self._init_params()
        self.opt = optax.chain(
            optax.clip_by_global_norm(5.0),          # models.py:223
            optax.adam(float(self.params_train["lr"])),
        )
        self.opt_state = self.opt.init(self.params)
        # resume from a previous run's checkpoint (reference retrain_dir
        # hyperparameter, main.py:128-132)
        if "retrain_dir" in self.params_train:
            import glob as _glob
            d = self.params_train["retrain_dir"]
            pm = sorted(_glob.glob(f"{d}/saved_model_*.msgpack"))
            po = sorted(_glob.glob(f"{d}/saved_optimizer_*.msgpack"))
            self.params, self.opt_state = Logger.load_checkpoint(
                self.params, self.opt_state, pm[-1], po[-1] if po else None)
            self.logger.record_loaded_checkpoint(pm[-1],
                                                 po[-1] if po else None)
        self._epoch_fns: Dict[Tuple, Any] = {}
        # batches per EVAL chunk program; 0 = monolithic per-(mode, nb)
        # epoch programs for eval too.  TRAIN always runs the monolithic
        # scan program: measured on the axon tunnel backend, per-chunk
        # dispatch round-trips cost ~7ms each (8x sustained train
        # slowdown), while eval passes are a few percent of runtime.
        # Chunking eval collapses the eval compiles (VALID/TEST/final
        # TRAIN-mode, 3 of the 4 programs per run) into ONE shared
        # program; see scripts/compile_bench.py for the measurement.
        self.chunk_batches = 16
        # TRAIN epochs longer than this many batches dispatch as
        # sequential fixed-size scan programs (huge-epoch splits, e.g.
        # papers100M's 1.2M train targets): single scan programs beyond
        # ~1k steps crash this backend's TPU worker (measured round 5,
        # scripts/papers100m_1to1.py)
        self.max_scan_batches = int(os.environ.get(
            "SHADOW_MAX_SCAN_BATCHES", "1024"))
        # --trace_dir: jax.profiler device trace of train epoch 1 (the
        # first post-compile epoch) — the TPU-native replacement for the
        # reference's absent timeline tracer (SURVEY §5.1)
        self.trace_dir: Optional[str] = None
        from shadow_gnn_tpu.train.profiler import SubgraphProfiler
        self.profiler = SubgraphProfiler(self.num_ensemble)
        # train-metric batch subsampling (reference --eval_train_every /
        # PERIOD_LOG, logging_base.py:216); 1 = use every batch
        self.eval_train_every = 1
        if matmul_precision:
            jax.config.update("jax_default_matmul_precision", matmul_precision)

    # ------------------------------------------------------------------
    def _build_branches(self) -> List[Dict[str, Any]]:
        """Decoupled per-branch sampler dicts -> static SamplerConfigs
        (per-mode variants: ppr_st falls back to ppr for VALID/TEST,
        minibatch.py:366-370)."""
        decoupled = decouple_ensemble(self.sampler_cfg_train["configs"])
        branches = []
        aug = tuple(self.arch["feature_augment"])
        for cfg_d in decoupled:
            method = cfg_d["method"]
            if method == "full":
                # FULL train mode (reference minibatch.py:226-232) is only
                # meaningful for adjacency-free models (mlp/sgc/sign whose
                # propagation happened in preprocessing); each target is
                # its own single-node block, i.e. nodeIID batching
                assert self.arch["aggr"] in ("mlp", "sgc", "sign"), (
                    "full-graph TRAIN sampling requires an adjacency-free "
                    "model (mlp/sgc/sign); graph convs need a subgraph "
                    "sampler")
                cfg_d = dict(cfg_d)
                cfg_d["method"] = method = "nodeIID"
            n_pad = default_n_pad(cfg_d, self.num_targets)
            common = dict(
                n_pad=n_pad,
                num_targets=self.num_targets,
                depth=int(cfg_d.get("depth", 2)),
                budget=int(cfg_d.get("budget", 20)),
                k=int(cfg_d.get("k", 200)),
                alpha=float(cfg_d.get("alpha", 0.85)),
                epsilon=float(cfg_d.get("epsilon", 1e-5)),
                threshold=float(cfg_d.get("threshold", 0.0)),
                add_self_edge=bool(cfg_d.get("add_self_edge", False)),
                include_target_conn=(False if self.task == "link"
                                     else bool(cfg_d.get(
                                         "include_target_conn", False))),
                aug_feats=aug,
            )
            cfg_mode = {}
            for m in (TRAIN, VALID, TEST):
                method_m = method
                if m in (VALID, TEST) and method == "ppr_st":
                    method_m = "ppr"
                induction, cap, dcap, hslots = "search", 0, 0, 0
                if method == "khop":
                    deg = np.diff(self._host_adj[m][0]).astype(np.float64)
                    max_deg = float(deg.max()) if deg.size else 1.0
                    mean_deg = float(deg.mean()) if deg.size else 1.0
                    over_budget = rows_gather_bytes(
                        max(self.batch_size, 256), n_pad, int(max_deg),
                        self.graph[m].row_block) > ROWS_GATHER_BUDGET
                    if self.undirected and (max_deg > 8 * mean_deg
                                            or over_budget):
                        # power-law graph: cap the per-member row width
                        # and route hub members through the pairwise
                        # search table; overflow is monitored per epoch
                        induction = "rows"
                        dcap = bucket_cap(int(max(64.0, 8.0 * mean_deg)))
                        hslots = max(8, n_pad // 8)
                    elif max_deg <= 4096 and not over_budget:
                        # exact row-slice induction, any directedness
                        induction, dcap = "rows", bucket_cap(int(max_deg))
                    elif max_deg <= 4096:
                        # DIRECTED over-budget small-degree graph: the
                        # hub table needs undirected symmetry, so keep
                        # the pairwise binary search — exact for any
                        # directedness and bounded by the [B,N,N] adj
                        # already materialized
                        pass
                    else:
                        # DIRECTED hub-heavy graph (no shipped dataset):
                        # candidate-edge enumeration with an estimated
                        # cap — E[deg of a sampled node] is size-biased;
                        # x3 slack, runtime overflow monitored per epoch
                        biased = float((deg ** 2).sum() / max(deg.sum(), 1))
                        est = min(max_deg, 3.0 * biased + 16.0)
                        induction, cap = "cand", bucket_cap(int(n_pad * est))
                cfg_mode[m] = SamplerConfig(method=method_m, induction=induction,
                                            cand_cap=cap, deg_cap=dcap,
                                            hub_slots=hslots, **common)
            branches.append({"raw": cfg_d, "cfg": cfg_mode})
        return branches

    # ------------------------------------------------------------------
    def _ppr_targets(self, mode: int) -> np.ndarray:
        """Which nodes need PPR rows (minibatch.py:383-389): the mode's
        node set for node tasks; ALL nodes for link tasks."""
        if self.task == "node":
            return np.asarray(self.entity_set[mode], dtype=np.int64)
        return np.arange(self.num_nodes, dtype=np.int64)

    def _ensure_tables(self, mode: int):
        if mode in self.tables:
            return
        self.tables[mode] = []
        for i_br, br in enumerate(self.branches):
            cfg = br["cfg"][mode]
            if cfg.method not in ("ppr", "ppr_st"):
                self.tables[mode].append(None)
                continue
            # stochastic PPR samples from a 2k pool (ensemble :226-238)
            k_tab = cfg.k * (2 if br["cfg"][TRAIN].method == "ppr_st" else 1)
            targets = self._ppr_targets(mode)
            # link-task (and transductive node-task) modes share the same
            # adjacency and target set -> compute the table ONCE and
            # duplicate (reference duplicate_modes, minibatch.py:383-389)
            memo_key = (i_br, k_tab, cfg.alpha, cfg.epsilon,
                        id(self._host_adj[mode][0]),
                        hash(targets.tobytes()))
            memo = getattr(self, "_ppr_memo", None)
            if memo is None:
                memo = self._ppr_memo = {}
            if memo_key in memo:
                tab, cfg_fields = memo[memo_key]
                import dataclasses as _dc_mod
                br["cfg"][mode] = _dc_mod.replace(br["cfg"][mode],
                                                  **cfg_fields)
                self.tables[mode].append(tab)
                continue
            neighs, scores = self._compute_ppr(mode, cfg, k_tab, targets)
            tab_n, tab_s = ppr_mod.ppr_topk_tables(neighs, scores, k_tab)
            if self.task == "link":
                # rows indexed by node id directly
                full_n = np.full((self.num_nodes, k_tab), -1, np.int32)
                full_s = np.zeros((self.num_nodes, k_tab), np.float32)
                full_n[targets] = tab_n
                full_s[targets] = tab_s
                tab_n, tab_s = full_n, full_s
            # deterministic scope -> exact induction sizing via the
            # shared cost model (sampling/induction.plan_ppr_induction)
            deg = np.diff(self._host_adj[mode][0]).astype(np.int64)
            scope_deg = (deg[np.clip(tab_n, 0, self.num_nodes - 1)]
                         * (tab_n >= 0))                       # [T, k_tab]
            root_deg = deg[targets]
            import dataclasses as _dc_mod
            cfg_fields = plan_ppr_induction(
                scope_deg, root_deg, n_pad=cfg.n_pad,
                num_targets=self.num_targets, batch_size=self.batch_size,
                undirected=self.undirected,
                row_block=self.graph[mode].row_block)
            br["cfg"][mode] = _dc_mod.replace(br["cfg"][mode], **cfg_fields)
            tab = PPRTables(jnp.asarray(tab_n), jnp.asarray(tab_s))
            memo[memo_key] = (tab, cfg_fields)
            self.tables[mode].append(tab)

    def _compute_ppr(self, mode: int, cfg: SamplerConfig, k_tab: int,
                     targets: np.ndarray):
        """Compute or load cached PPR lists for one mode, honoring the
        reference's cache naming + reuse-larger-k contract."""
        indptr, indices = self._host_adj[mode]
        mode_for_file = mode if self.task == "node" else mode
        variant = ("wval" if self.config_data.get("valedges_as_input", False)
                   else "")
        fn, fs = ppr_mod.find_ppr_cache(
            self.dir_data, self.name_data, self.is_transductive,
            MODE2STR[mode_for_file], cfg.alpha, cfg.epsilon, k_tab,
            variant=variant)
        if fn:
            cached = ppr_mod.read_ppr_cache(fn, fs, k_tab, cfg.alpha,
                                            cfg.epsilon)
            if cached is not None:
                nv, sv = cached
                return [nv[t] for t in targets], [sv[t] for t in targets]
        t0 = time.time()
        if self.use_device_ppr:
            # HBM-fit the block to THIS mode's graph: VALID/TEST run
            # over the full adjacency, which can carry more edges than
            # the TRAIN graph the constructor saw (inductive datasets)
            _, batch_m = ppr_mod.plan_device_ppr(
                self.num_nodes, int(indices.size), self._hbm_bytes)
            neighs, scores = ppr_mod.ppr_power_device(
                indptr, indices, targets, k_tab, cfg.alpha,
                batch=batch_m)
        else:
            neighs, scores = ppr_mod.ppr_push_host(
                indptr, indices, targets, k_tab, cfg.alpha, cfg.epsilon)
        print(f"PPR precompute [{MODE2STR[mode]}] {targets.size} targets "
              f"in {time.time() - t0:.1f}s")
        if self.dir_data:
            fn, fs = ppr_mod.ppr_cache_paths(
                self.dir_data, self.name_data, self.is_transductive,
                MODE2STR[mode_for_file], cfg.alpha, cfg.epsilon, k_tab,
                variant=variant)
            try:
                ppr_mod.write_ppr_cache(fn, fs, self.num_nodes, targets,
                                        neighs, scores, k_tab, cfg.alpha,
                                        cfg.epsilon)
            except OSError:
                pass
        return neighs, scores

    # ------------------------------------------------------------------
    def _init_params(self):
        rng = jax.random.PRNGKey(self.seed)
        b, t = 2, self.num_targets
        dummy_batches, dummy_feats = [], []
        for br in self.branches:
            cfg = br["cfg"][TRAIN]
            n = cfg.n_pad
            from shadow_gnn_tpu.sampling.batch import SubgraphBatch
            dummy_batches.append(SubgraphBatch(
                nodes=jnp.zeros((b, n), jnp.int32),
                node_mask=jnp.ones((b, n), bool),
                adj=jnp.zeros((b, n, n), jnp.float32),
                targets=jnp.zeros((b, t), jnp.int32),
                size=jnp.full((b,), n, jnp.int32),
                hop=jnp.zeros((b, n), jnp.int32),
                ppr=jnp.zeros((b, n), jnp.float32),
                drnl=jnp.zeros((b, n), jnp.int32),
            ))
            dummy_feats.append(jnp.zeros(
                (b, n, self.dim_feat_smooth + self.dim_label_smooth),
                jnp.float32))
        return self.model.init(
            {"params": rng, "dropout": rng, "dropedge": rng},
            dummy_batches, dummy_feats, mode_train=False, train=False)

    # ------------------------------------------------------------------
    def _mode_arrays(self, mode: int) -> "ModeArrays":
        """All large device buffers an epoch program needs, as an
        explicit pytree ARGUMENT.  Never close jitted code over these:
        this backend serializes captured constants into the compiled
        program (multi-minute compiles; HTTP 413 at papers100M scale)."""
        return ModeArrays(
            indptr=self.graph[mode].indptr,
            indices=self.graph[mode].indices,
            feat_tab=self.feat_tab,
            tables=tuple(self.tables.get(mode)
                         or [None] * self.num_ensemble),
            caches=tuple(self.caches.get(mode)
                         or [None] * self.num_ensemble),
        )

    def _sample_branch_batches(self, mode: int, roots, rows, rng,
                               arrays: "ModeArrays"):
        from shadow_gnn_tpu.sampling.cache import gather_batch
        import dataclasses as _dc
        graph = _dc.replace(self.graph[mode], indptr=arrays.indptr,
                            indices=arrays.indices)
        batches, feats = [], []
        for i, br in enumerate(self.branches):
            cfg = br["cfg"][mode]
            rng, sub = jax.random.split(rng)
            if arrays.caches[i] is not None:
                # must mirror the model's packed-path decision
                # (model.py:125-127): a bf16 compute dtype takes the dense
                # prepare_adj path, which needs the unpacked adjacency
                packed = (self.model_cfg.packed_adj
                          and cfg.method in ("ppr",)
                          and self.model_cfg.aggr in ("gcn", "sage", "gin")
                          and self.model_cfg.compute_dtype == "float32")
                batch = gather_batch(arrays.caches[i], rows[:, 0],
                                     cfg.n_pad, self.num_nodes,
                                     unpack=not packed)
            else:
                batch = sample_subgraphs(cfg, graph, roots,
                                         rng=sub, table_rows=rows,
                                         tables=arrays.tables[i])
            feat = arrays.feat_tab[jnp.clip(batch.nodes, 0,
                                            self.num_nodes - 1)]
            batches.append(batch)
            feats.append(feat)
        return batches, feats

    def _ensure_caches(self, mode: int):
        """Build the per-branch device subgraph cache (deterministic
        samplers only, memory-gated)."""
        from shadow_gnn_tpu.sampling import cache as cache_mod
        if mode in self.caches or mode in self.nocache_modes:
            self.caches.setdefault(mode, [None] * self.num_ensemble)
            return
        self.caches[mode] = [None] * self.num_ensemble
        ent = np.asarray(self.entity_set[mode])
        for i, br in enumerate(self.branches):
            cfg = br["cfg"][mode]
            if cfg.method != "ppr":      # REUSABLE_SAMPLER = {ppr}
                continue
            est = cache_mod.estimate_bytes(ent.size, cfg.n_pad)
            if est > self.cache_budget_bytes:
                print(f"[cache] branch {i} mode {MODE2STR[mode]}: "
                      f"{est / 1e9:.1f}GB exceeds budget, resampling")
                continue
            roots_all = ent[:, None].astype(np.int32)
            rows_all = np.arange(ent.size, dtype=np.int32)[:, None]
            graph_meta = self.graph[mode]

            def sample_fn(r, rw, aux, cfg=cfg, graph_meta=graph_meta):
                import dataclasses as _dc
                indptr, indices, tabs = aux
                g = _dc.replace(graph_meta, indptr=indptr, indices=indices)
                return sample_subgraphs(cfg, g, r,
                                        rng=jax.random.PRNGKey(0),
                                        table_rows=rw, tables=tabs)

            t0 = time.time()
            self.caches[mode][i] = cache_mod.build_cache(
                sample_fn, ent.size, roots_all, rows_all, cfg,
                self.num_nodes,
                aux=(graph_meta.indptr, graph_meta.indices,
                     self.tables[mode][i]))
            print(f"[cache] built branch {i} {MODE2STR[mode]}: "
                  f"{ent.size} subgraphs, {est / 1e6:.0f}MB, "
                  f"{time.time() - t0:.1f}s")

    def disable_cache(self, mode: int):
        """reference minibatch.disable_cache (inference path)."""
        self.nocache_modes.add(mode)
        self.caches.pop(mode, None)
        self.caches[mode] = [None] * self.num_ensemble

    def _make_epoch_fn(self, mode: int, nb: int, train: bool):
        """Build the jitted scan-over-batches epoch program.  All big
        buffers come in through the ``arrays`` argument."""
        model, opt, cfg_m = self.model, self.opt, self.model_cfg

        def train_step(arrays, carry, xs):
            params, opt_state, rng = carry
            roots, rows, labels, w = xs
            rng, r_samp, r_do, r_de = jax.random.split(rng, 4)
            batches, feats = self._sample_branch_batches(mode, roots, rows,
                                                         r_samp, arrays)

            def lf(p):
                logits, _ = model.apply(
                    p, batches, feats, mode_train=True, train=True,
                    rngs={"dropout": r_do, "dropedge": r_de})
                return weighted_loss_fn(cfg_m, logits, labels, w), logits

            (loss, logits), grads = jax.value_and_grad(lf, has_aux=True)(params)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            preds = predict_fn(cfg_m, logits)
            ovf = sum(b.overflow for b in batches)
            return (params, opt_state, rng), (loss, preds, ovf)

        def eval_step(arrays, carry, xs):
            params, rng = carry
            roots, rows, labels, w = xs
            rng, r_samp = jax.random.split(rng)
            batches, feats = self._sample_branch_batches(mode, roots, rows,
                                                         r_samp, arrays)
            # the reference zeroes label-input features whenever the MODE
            # is TRAIN, including status='final' eval passes
            # (models.py:182-183) -- zeroing follows the mode, dropout
            # follows train/eval status
            logits, _ = model.apply(params, batches, feats,
                                    mode_train=(mode == TRAIN), train=False)
            loss = weighted_loss_fn(cfg_m, logits, labels, w)
            ovf = sum(b.overflow for b in batches)
            return (params, rng), (loss, predict_fn(cfg_m, logits), ovf)

        import functools as _ft
        if train:
            # params/opt_state are rebound by the caller every epoch and
            # snapshotted host-side (logger.update_best_model device_gets)
            # -> donate so the 2x-params Adam state updates in place
            # instead of allocating+copying a fresh tree per epoch call
            @partial(jax.jit, donate_argnums=(0, 1))
            def epoch(params, opt_state, rng, roots, rows, labels, w, arrays):
                (params, opt_state, _), (losses, preds, ovf) = jax.lax.scan(
                    _ft.partial(train_step, arrays), (params, opt_state, rng),
                    (roots, rows, labels, w))
                return params, opt_state, losses, preds, ovf.sum()
            return epoch

        @jax.jit
        def epoch_e(params, rng, roots, rows, labels, w, arrays):
            _, (losses, preds, ovf) = jax.lax.scan(
                _ft.partial(eval_step, arrays), (params, rng),
                (roots, rows, labels, w))
            return losses, preds, ovf.sum()
        return epoch_e

    # ------------------------------------------------------------------
    # Chunked epoch programs (the default path for EVAL passes).
    #
    # An epoch runs as ceil(nb / C) calls of a fixed-shape CHUNK program
    # (a lax.scan over C batches).  All per-mode, per-epoch data reaches
    # the chunk through scan inputs whose shapes depend only on
    # (C, batch_size, n_pad, k_tab): PPR table rows and cached subgraph
    # rows are pre-gathered OUTSIDE the program, and the label-zeroing
    # mode flag is traced.  Consequence: ONE compiled eval program
    # serves every mode, epoch length, and split size — VALID, TEST and
    # the final TRAIN-mode pass were 3 of the 4 fresh compiles per run
    # under the monolithic design.  TRAIN keeps the monolithic scan
    # program: per-chunk dispatch round-trips through the axon tunnel
    # measured ~7ms each (8x sustained train slowdown; on a local TPU
    # runtime with ~µs dispatch the chunked train path below would be
    # viable, and remains tested).  Calls are enqueued asynchronously;
    # nothing syncs until the final host conversion.

    def _branch_kinds(self, mode: int) -> tuple:
        kinds = []
        caches = self.caches.get(mode) or [None] * self.num_ensemble
        for i, br in enumerate(self.branches):
            if caches[i] is not None:
                kinds.append("cache")
            elif br["cfg"][mode].method in ("ppr", "ppr_st"):
                kinds.append("table")
            else:
                kinds.append("plain")
        return tuple(kinds)

    def _pregather(self, mode: int, kinds: tuple, rows) -> tuple:
        """[C, b, t] table rows -> per-branch chunk scan inputs
        ([C, b, ...] slices; shapes never depend on the mode's entity
        count)."""
        out = []
        for i in range(self.num_ensemble):
            if kinds[i] == "cache":
                r = rows[..., 0]
                out.append(jax.tree_util.tree_map(
                    lambda a: a[r], self.caches[mode][i]))
            elif kinds[i] == "table":
                tab = self.tables[mode][i]
                out.append((tab.neighs[rows], tab.scores[rows]))
            else:
                out.append(())
        return tuple(out)

    def _branch_batches_fn(self, cfgs, kinds):
        """Shared closure: per-branch batch construction inside the
        chunked programs (cache gather / pre-gathered table slices /
        free-running samplers)."""
        from shadow_gnn_tpu.sampling.cache import gather_batch
        cfg_m = self.model_cfg
        num_nodes = self.num_nodes

        def branch_batches(graph, feat_tab, roots, rng, bxs):
            batches, feats = [], []
            for i, cfg in enumerate(cfgs):
                rng, sub = jax.random.split(rng)
                if kinds[i] == "cache":
                    # must mirror the model's packed-path decision
                    # (model.py:125-127)
                    packed = (cfg_m.packed_adj and cfg.method == "ppr"
                              and cfg_m.aggr in ("gcn", "sage", "gin")
                              and cfg_m.compute_dtype == "float32")
                    batch = gather_batch(bxs[i], jnp.arange(roots.shape[0]),
                                         cfg.n_pad, num_nodes,
                                         unpack=not packed)
                elif kinds[i] == "table":
                    batch = sample_subgraphs(cfg, graph, roots, rng=sub,
                                             table_slices=bxs[i])
                else:
                    batch = sample_subgraphs(cfg, graph, roots, rng=sub)
                feats.append(feat_tab[jnp.clip(batch.nodes, 0,
                                               num_nodes - 1)])
                batches.append(batch)
            return batches, feats

        return branch_batches

    def _chunk_fn(self, mode: int, train: bool):
        cfgs = tuple(br["cfg"][mode] for br in self.branches)
        kinds = self._branch_kinds(mode)
        key = (train, cfgs, kinds)
        if key in self._epoch_fns:
            return self._epoch_fns[key], kinds
        model, opt, cfg_m = self.model, self.opt, self.model_cfg
        branch_batches = self._branch_batches_fn(cfgs, kinds)

        if train:
            def t_step(graph, feat_tab, carry, x):
                params, opt_state, rng = carry
                roots, labels, w, bxs = x
                rng, r_samp, r_do, r_de = jax.random.split(rng, 4)
                batches, feats = branch_batches(graph, feat_tab, roots,
                                                r_samp, bxs)

                def lf(p):
                    logits, _ = model.apply(
                        p, batches, feats, mode_train=True, train=True,
                        rngs={"dropout": r_do, "dropedge": r_de})
                    return weighted_loss_fn(cfg_m, logits, labels, w), logits

                (loss, logits), grads = jax.value_and_grad(
                    lf, has_aux=True)(params)
                # zero-weight batches are chunk PADDING (_run_chunks pads
                # a short final chunk): their gradients are zero, but an
                # unconditional opt.update would still apply Adam's
                # momentum (m_hat/(sqrt(v_hat)+eps) != 0) — a spurious
                # parameter step the monolithic path never takes.  Skip
                # the whole update for padded steps.
                def upd(po):
                    p, o = po
                    updates, o = opt.update(grads, o, p)
                    return optax.apply_updates(p, updates), o

                params, opt_state = jax.lax.cond(
                    w.sum() > 0, upd, lambda po: po, (params, opt_state))
                ovf = sum(b.overflow for b in batches)
                return (params, opt_state, rng), (loss, predict_fn(cfg_m,
                                                                   logits), ovf)

            @partial(jax.jit, donate_argnums=(0, 1))
            def chunk(params, opt_state, rng, graph, feat_tab, xs):
                (params, opt_state, rng), (losses, preds, ovf) = jax.lax.scan(
                    partial(t_step, graph, feat_tab),
                    (params, opt_state, rng), xs)
                return params, opt_state, rng, losses, preds, ovf.sum()
        else:
            def e_step(params, graph, feat_tab, mode_train, rng, x):
                roots, labels, w, bxs = x
                rng, r_samp = jax.random.split(rng)
                batches, feats = branch_batches(graph, feat_tab, roots,
                                                r_samp, bxs)
                # label-input zeroing follows the MODE (traced scalar, so
                # final TRAIN-mode evals reuse this program); dropout
                # follows train/eval status (models.py:182-183)
                logits, _ = model.apply(params, batches, feats,
                                        mode_train=mode_train, train=False)
                loss = weighted_loss_fn(cfg_m, logits, labels, w)
                ovf = sum(b.overflow for b in batches)
                return rng, (loss, predict_fn(cfg_m, logits), ovf)

            @jax.jit
            def chunk(params, rng, mode_train, graph, feat_tab, xs):
                rng, (losses, preds, ovf) = jax.lax.scan(
                    partial(e_step, params, graph, feat_tab, mode_train),
                    rng, xs)
                return rng, losses, preds, ovf.sum()

        self._epoch_fns[key] = chunk
        return chunk, kinds

    def _run_chunks(self, mode: int, train: bool, nb: int, roots, rows,
                    labels_dev, w_dev, rng):
        """Run one epoch through the chunked programs; returns host
        (losses [nb], preds [nb, b, ...], overflow)."""
        fn, kinds = self._chunk_fn(mode, train)
        graph, feat_tab = self.graph[mode], self.feat_tab
        # FIXED chunk length: a short epoch pads its single chunk with
        # zero-weight batches rather than tracing a second chunk shape
        # (a few wasted eval batches are orders cheaper than another
        # multi-minute compile on this backend)
        # chunk_batches == 0 (monolithic mode) still reaches this path
        # through predict_full: degrade to a single epoch-length chunk
        C = self.chunk_batches if self.chunk_batches > 0 else nb
        n_chunks = -(-nb // C)
        losses_l, preds_l, ovf_l = [], [], []
        mt = jnp.asarray(mode == TRAIN)
        for ci in range(n_chunks):
            s, e = ci * C, min((ci + 1) * C, nb)
            pad = C - (e - s)

            def cut(a):
                sl = a[s:e]
                if pad:
                    sl = jnp.concatenate(
                        [sl, jnp.repeat(a[s:s + 1], pad, 0)], 0)
                return sl

            w_c = cut(w_dev)
            if pad:
                w_c = w_c.at[e - s:].set(0.0)
            xs = (cut(roots), cut(labels_dev), w_c,
                  self._pregather(mode, kinds, cut(rows)))
            if train:
                (self.params, self.opt_state, rng, lo, pr, ov) = fn(
                    self.params, self.opt_state, rng, graph, feat_tab, xs)
            else:
                rng, lo, pr, ov = fn(self.params, rng, mt, graph,
                                     feat_tab, xs)
            losses_l.append(lo)
            preds_l.append(pr)
            ovf_l.append(ov)
        # host conversion AFTER the loop: dispatches stay async
        losses = np.concatenate([np.asarray(l) for l in losses_l])[:nb]
        preds = np.concatenate([np.asarray(p) for p in preds_l])[:nb]
        ovf = sum(int(o) for o in ovf_l)
        return losses, preds, ovf

    # ------------------------------------------------------------------
    def _epoch_arrays(self, mode: int):
        """Shuffled, percent-sampled, batch-padded root/row/label arrays."""
        b = self.batch_size
        if self.task == "node":
            ent = np.asarray(self.entity_set[mode])
            perm = self.rng_np.permutation(ent.size)
            pct = float(self.params_train["percent_per_epoch"][MODE2STR[mode]])
            if pct < 1.0:
                perm = perm[:int(np.ceil(pct * perm.size))]
            roots = ent[perm][:, None]                        # [M, 1]
            rows = perm[:, None]                              # table rows
            labels = self.label_np[ent[perm]]
        else:
            es = self.entity_set[mode]
            pos = es["pos"]
            if "neg" in es:
                neg = es["neg"]
            else:
                neg = self._negative_sample(pos.shape[0])
            edges = np.concatenate([pos, neg], 0)
            labels = np.repeat([1.0, 0.0],
                               [pos.shape[0], neg.shape[0]])[:, None]
            perm = self.rng_np.permutation(edges.shape[0])
            pct = float(self.params_train["percent_per_epoch"][MODE2STR[mode]])
            if pct < 1.0:
                perm = perm[:int(np.ceil(pct * perm.size))]
            roots = edges[perm]                               # [M, 2]
            rows = roots                                      # row = node id
            labels = labels[perm]
        m = roots.shape[0]
        nb = -(-m // b)
        pad = nb * b - m
        w = np.concatenate([np.ones(m, np.float32), np.zeros(pad, np.float32)])
        roots = np.concatenate([roots, np.repeat(roots[:1], pad, 0)])
        rows = np.concatenate([rows, np.repeat(rows[:1], pad, 0)])
        labels = np.concatenate([labels, np.repeat(labels[:1], pad, 0)])
        t = self.num_targets
        shape_lab = (nb, b) + labels.shape[1:]
        if self.task == "node" and labels.ndim == 1:
            lab_dev = jnp.asarray(labels.reshape(nb, b).astype(np.int32))
        else:
            lab_dev = jnp.asarray(labels.reshape(shape_lab).astype(np.float32))
        return (nb,
                jnp.asarray(roots.reshape(nb, b, t).astype(np.int32)),
                jnp.asarray(rows.reshape(nb, b, t).astype(np.int32)),
                lab_dev,
                jnp.asarray(w.reshape(nb, b)),
                labels, w)

    def _negative_sample(self, n: int) -> np.ndarray:
        """Uniform negative edges avoiding existing train edges + self
        loops (minibatch.py:287-293 via PyG negative_sampling).

        Membership is ONE ``np.searchsorted`` over a cached sorted
        composite-key (u * num_nodes + v) edge array — a CSR with
        per-row-sorted columns yields globally sorted keys, so the
        whole candidate batch resolves in a single C-level binary
        search (the per-candidate Python loop this replaced was ~2.4M
        interpreter calls per collab epoch).

        The epoch's negatives are PREFETCHED: a daemon thread computes
        the next epoch's sample (with its own PRNG stream, so the main
        ``rng_np`` call order — and therefore seed reproducibility —
        is unchanged) while the device trains the current epoch; the
        host-side cost disappears from the critical path."""
        import threading
        th = self._neg_thread
        if th is not None:
            th.join()
            self._neg_thread = None
            out = self._neg_result
            if out.shape[0] == n:
                self._start_neg_prefetch(n)
                return out
        out = self._negative_sample_now(n)
        self._start_neg_prefetch(n)
        return out

    def _start_neg_prefetch(self, n: int) -> None:
        import threading

        def work():
            self._neg_result = self._negative_sample_now(n)

        self._neg_thread = threading.Thread(target=work, daemon=True)
        self._neg_thread.start()

    def _negative_sample_now(self, n: int) -> np.ndarray:
        if self._neg_edge_keys is None:
            indptr, indices = self._host_adj[TRAIN]
            indptr = np.asarray(indptr, dtype=np.int64)
            rows = np.repeat(np.arange(self.num_nodes, dtype=np.int64),
                             np.diff(indptr))
            keys = rows * self.num_nodes + np.asarray(indices,
                                                      dtype=np.int64)
            # converter/loader keep CSR columns sorted per row; sort
            # defensively if not (cheap one-time cost)
            if np.any(np.diff(keys) < 0):
                keys = np.sort(keys)
            self._neg_edge_keys = keys
        keys = self._neg_edge_keys
        out, filled = None, 0
        while filled < n:
            # rejection probability is ~(m + N)/N^2 — tiny — so a ~2%
            # overshoot almost always finishes in one pass with no
            # growing-concatenate traffic
            size = (n - filled) + ((n - filled) >> 6) + 16
            cand = self._neg_rng.integers(0, self.num_nodes,
                                          size=(size, 2), dtype=np.int64)
            ck = cand[:, 0] * self.num_nodes + cand[:, 1]
            pos = np.searchsorted(keys, ck)
            bad = (cand[:, 0] == cand[:, 1]) | (
                (pos < keys.size)
                & (keys[np.minimum(pos, keys.size - 1)] == ck))
            good = cand[~bad]
            if out is None:
                if good.shape[0] >= n:
                    return good[:n]
                out = np.empty((n, 2), np.int64)
            take = min(n - filled, good.shape[0])
            out[filled:filled + take] = good[:take]
            filled += take
        return out

    # ------------------------------------------------------------------
    def _run_partition_epoch(self, mode, nb, roots, rows, labels, w, rng):
        """TRAIN epoch over the multi-device partition step.

        ONE device dispatch per epoch on every partition mode (dp /
        feat / edge): each step factory builds a whole-epoch
        scan-over-batches program (per-batch dispatches cost ~7ms each
        through the remote-TPU tunnel — the same consideration that
        keeps the single-device TRAIN path a monolithic lax.scan).
        Multi-process too: every host feeds its process-local batch
        columns of the [nb, B, ...] epoch arrays and logits come back
        replicated for the metric pass.  Parameters live replicated on
        the mesh across the epoch and are pulled back to the default
        device at the end so eval epochs and checkpointing see ordinary
        arrays.
        """
        multi = jax.process_count() > 1
        if mode not in self._partition_fns:
            n = self.partition_devices or len(jax.devices())
            from shadow_gnn_tpu.parallel import multihost as mh
            mesh = mh.global_dp_mesh() if multi else None
            if self.partition == "dp":
                from shadow_gnn_tpu.parallel.dp import make_dp_train_step
                step, shard, repl = make_dp_train_step(
                    self, mode, n, return_logits=True, epoch_scan=True,
                    mesh=mesh)
            elif self.partition == "feat":
                from shadow_gnn_tpu.parallel.partition import (
                    make_sharded_train_step)
                step, shard, repl, _ = make_sharded_train_step(
                    self, mode, n, return_logits=True, epoch_scan=True,
                    mesh=mesh)
            else:
                from shadow_gnn_tpu.parallel.edgepart import (
                    make_edgepart_train_step)
                step, shard, repl = make_edgepart_train_step(
                    self, mode, n, epoch_scan=True,
                    return_logits=multi, mesh=mesh)
            self._partition_fns[mode] = (step, shard, repl)
        step, shard, repl = self._partition_fns[mode]
        params = repl(self.params)
        opt_state = repl(self.opt_state)
        if multi:
            from shadow_gnn_tpu.parallel import multihost as mh
            bsl = mh.process_slice(self.batch_size)
            xs = shard(tuple(np.asarray(a)[:, bsl]
                             for a in (roots, rows, labels, w)))
        else:
            xs = shard((roots, rows, labels, w))
        params, opt_state, losses, logits, ovf = step(
            params, opt_state, rng, *xs)
        self.partition_train_dispatches += 1
        losses = np.asarray(losses)
        preds = np.asarray(predict_fn(self.model_cfg, logits))
        ovf = int(ovf)
        # back to ordinary default-device arrays for eval/checkpointing
        self.params = jax.tree_util.tree_map(
            lambda x: jnp.asarray(np.asarray(x)), params)
        self.opt_state = jax.tree_util.tree_map(
            lambda x: jnp.asarray(np.asarray(x)), opt_state)
        return losses, preds, ovf

    # ------------------------------------------------------------------
    def _run_partition_eval(self, mode, nb, roots, rows, labels, w, rng):
        """EVAL epoch over the multi-device partition step ('feat' /
        'edge'): the graph/feature/table shards never need to fit one
        device for evaluation either."""
        multi = jax.process_count() > 1
        key = ("eval", mode)
        if key not in self._partition_fns:
            n = self.partition_devices or len(jax.devices())
            from shadow_gnn_tpu.parallel import multihost as mh
            mesh = mh.global_dp_mesh() if multi else None
            if self.partition in ("feat", "dp"):
                # 'dp' reaches here only multi-process (its single-
                # process evals ride _run_chunks); the row-sharded eval
                # step is a superset of replicated-feature DP
                from shadow_gnn_tpu.parallel.partition import (
                    make_sharded_train_step)
                step, shard, repl, _ = make_sharded_train_step(
                    self, mode, n, train=False, mesh=mesh)
            else:
                from shadow_gnn_tpu.parallel.edgepart import (
                    make_edgepart_train_step)
                step, shard, repl = make_edgepart_train_step(
                    self, mode, n, train=False, mesh=mesh)
            self._partition_fns[key] = (step, shard, repl)
        step, shard, repl = self._partition_fns[key]
        params = repl(self.params)
        bsl = slice(None)
        if multi:
            from shadow_gnn_tpu.parallel import multihost as mh
            bsl = mh.process_slice(self.batch_size)
        losses, preds, ovf = [], [], 0
        for ib in range(nb):
            xs = shard(tuple(np.asarray(a[ib])[bsl]
                             for a in (roots, rows, labels, w)))
            loss, logits, ovf_b = step(params, jax.random.fold_in(rng, ib),
                                       *xs)
            losses.append(float(loss))
            preds.append(np.asarray(predict_fn(self.model_cfg, logits)))
            ovf += int(ovf_b)
        return np.asarray(losses), np.stack(preds), ovf

    # ------------------------------------------------------------------
    def run_epoch(self, epoch: int, mode: int, status: str = "running"):
        self._ensure_tables(mode)
        self._ensure_caches(mode)
        if epoch == 0 and status == "running" and self.profiler.enabled:
            # subgraph statistics over the FULL first epoch (reference
            # profiler protocol: accumulate epoch 0, print, clear —
            # main.py:165,188), as one sampling-only chunked scan
            self._profile_epoch(mode)
            print(f"[profiler] {MODE2STR[mode]} subgraph stats:")
            self.profiler.print_summary()
            self.profiler.clear_metrics()
            self.profiler.enabled = False
        train = (mode == TRAIN and status == "running")
        (nb, roots, rows, labels_dev, w_dev, labels_np, w_np) = \
            self._epoch_arrays(mode)
        rng = jax.random.PRNGKey(self.rng_np.integers(1 << 31))
        do_trace = (self.trace_dir is not None and train and epoch == 1)
        if do_trace:
            jax.profiler.start_trace(self.trace_dir)
        t0 = time.time()
        if train and self.partition != "none":
            losses, preds, ovf = self._run_partition_epoch(
                mode, nb, roots, rows, labels_dev, w_dev, rng)
        elif not train and (self.partition in ("feat", "edge")
                            or (self.partition == "dp"
                                and jax.process_count() > 1)):
            losses, preds, ovf = self._run_partition_eval(
                mode, nb, roots, rows, labels_dev, w_dev, rng)
        elif self.chunk_batches > 0 and not train:
            losses, preds, ovf = self._run_chunks(
                mode, train, nb, roots, rows, labels_dev, w_dev, rng)
        elif train and nb > self.max_scan_batches:
            # huge-epoch TRAIN (papers100M-class split sizes): one scan
            # program over ALL nb batches reproducibly crashes this
            # backend's TPU worker beyond ~1k steps, so the epoch runs
            # as sequential dispatches of a fixed-size scan program
            # (plus one remainder-size program) with params threaded
            # through — identical semantics, ~7 ms dispatch per chunk
            arrays = self._mode_arrays(mode)
            cap = self.max_scan_batches
            losses_l, preds_l, ovf = [], [], 0
            for lo in range(0, nb, cap):
                c = min(cap, nb - lo)
                key = (mode, c, train)
                if key not in self._epoch_fns:
                    self._epoch_fns[key] = self._make_epoch_fn(mode, c, train)
                rng, sub = jax.random.split(rng)
                (self.params, self.opt_state, l_c, p_c,
                 o_c) = self._epoch_fns[key](
                    self.params, self.opt_state, sub,
                    roots[lo:lo + c], rows[lo:lo + c],
                    labels_dev[lo:lo + c], w_dev[lo:lo + c], arrays)
                losses_l.append(np.asarray(l_c))
                preds_l.append(np.asarray(p_c))
                ovf += int(o_c)
            losses = np.concatenate(losses_l)
            preds = np.concatenate(preds_l)
        else:
            key = (mode, nb, train)
            if key not in self._epoch_fns:
                self._epoch_fns[key] = self._make_epoch_fn(mode, nb, train)
            fn = self._epoch_fns[key]
            arrays = self._mode_arrays(mode)
            if train:
                self.params, self.opt_state, losses, preds, ovf = fn(
                    self.params, self.opt_state, rng, roots, rows,
                    labels_dev, w_dev, arrays)
            else:
                losses, preds, ovf = fn(self.params, rng, roots, rows,
                                        labels_dev, w_dev, arrays)
            losses, preds, ovf = np.asarray(losses), np.asarray(preds), int(ovf)
        if do_trace:
            jax.profiler.stop_trace()
            print(f"[trace] device trace of train epoch 1 written to "
                  f"{self.trace_dir}")
        if int(ovf) > 0:
            print(f"[WARN] induction candidate overflow: {int(ovf)} edges "
                  f"dropped this epoch (raise cand_cap)")
        preds = preds.reshape(-1, preds.shape[-1])
        t1 = time.time()
        # metrics on host over valid rows; TRAIN metrics optionally use
        # only every Nth batch (reference PERIOD_LOG subsampling)
        valid = w_np > 0
        if train and self.eval_train_every > 1:
            sel = np.arange(losses.size) % self.eval_train_every == 0
            losses = losses[sel]
            valid = valid & np.repeat(sel, self.batch_size)
        y_pred = preds[valid]
        y_true = labels_np[valid]
        if self.task == "node" and y_true.ndim == 1:
            y_true = np.eye(self.num_classes, dtype=np.float32)[
                y_true.astype(np.int64)]
        stats = {"loss": float(losses.mean())}
        stats.update(self.metrics.calc(y_true, y_pred))
        self.logger.log_epoch(mode, epoch, stats, status=status,
                              time_s=t1 - t0)
        return stats

    # ------------------------------------------------------------------
    def train(self, log_test_convergence: int = -1):
        max_epoch = int(self.params_train["end"])
        for e in range(max_epoch):
            self.run_epoch(e, TRAIN)
            self.run_epoch(e, VALID)
            if log_test_convergence > 0 and e % log_test_convergence == 0:
                # labeled with the TRAIN epoch it tracks (main.py:185-186)
                self.run_epoch(e, TEST)
            self.logger.update_best_model(e, self.params, self.opt_state)
        self.logger.validate_result()
        print("=" * 22 + "\nOptimization Finished!\n" + "=" * 22)
        best_params, best_opt = self.logger.restore_model(self.params,
                                                          self.opt_state)
        if best_params is not None:
            self.params = best_params
        for md in (TRAIN, VALID, TEST):
            stats = self.run_epoch(max_epoch, md, status="final")
            self.logger.log_final(md, stats)
        return self.logger.final_stats

    def predict_full(self, modes=(TRAIN, VALID, TEST)) -> np.ndarray:
        """Full-graph prediction matrix pred_mat[raw node id] = probs,
        for C&S postprocessing (reference main.py:237-249)."""
        assert self.task == "node"
        pred_mat = np.zeros((self.num_nodes, self.num_classes), np.float32)
        for md in modes:
            self._ensure_tables(md)
            (nb, roots, rows, labels_dev, w_dev, labels_np, w_np) = \
                self._epoch_arrays(md)
            _losses, preds, _ovf = self._run_chunks(
                md, False, nb, roots, rows, labels_dev, w_dev,
                jax.random.PRNGKey(0))
            preds = np.asarray(preds).reshape(-1, self.num_classes)
            r = np.asarray(roots).reshape(-1, self.num_targets)[:, 0]
            valid = w_np > 0
            pred_mat[r[valid]] = preds[valid]
        return pred_mat

    # ------------------------------------------------------------------
    # Online serving (no reference counterpart: the reference's only
    # inference path replays full eval epochs, main.py:204-211; point
    # queries are a deployment capability the epoch machinery can't
    # express).  Latency/throughput: scripts/serving_bench.py, BENCH.md.
    def _serve_lookup(self, mode: int) -> np.ndarray:
        """id -> PPR-table-row map for the mode's target set (-1 = not
        covered).  For serving over arbitrary ids, put every node in the
        mode's node_set before building tables (the serving analog of
        the reference's transductive-link protocol, minibatch.py:383-389)."""
        key = ("serve_lookup", mode)
        if key not in self._epoch_fns:
            lk = np.full(self.num_nodes, -1, dtype=np.int64)
            lk[self._ppr_targets(mode)] = np.arange(
                self._ppr_targets(mode).size)
            self._epoch_fns[key] = lk
        return self._epoch_fns[key]

    def _serve_fn(self, mode: int):
        key = ("serve", mode)
        if key in self._epoch_fns:
            return self._epoch_fns[key]
        model, cfg_m = self.model, self.model_cfg

        @jax.jit
        def serve(params, roots, rows, arrays):
            batches, feats = self._sample_branch_batches(
                mode, roots, rows, jax.random.PRNGKey(0), arrays)
            logits, emb_ens = model.apply(params, batches, feats,
                                          mode_train=False, train=False)
            return predict_fn(cfg_m, logits), jnp.stack(emb_ens)

        self._epoch_fns[key] = serve
        return serve

    def _serve_batch(self, ids, mode: int):
        assert self.task == "node", "point-query serving is node-task only"
        ids = np.asarray(ids, dtype=np.int64).ravel()
        if ids.size == 0:
            raise ValueError("empty id batch")
        self._ensure_tables(mode)
        rows = self._serve_lookup(mode)[ids]
        if (rows < 0).any():
            raise ValueError(
                f"node ids not covered by mode-{mode} PPR tables "
                f"(first few: {ids[rows < 0][:5].tolist()}); include them "
                "in the mode's node_set before building the trainer")
        n = ids.size
        # pad to shared buckets so request sizes reuse compiled programs
        cap = 8 if n <= 8 else bucket_cap(n)
        if cap > n:
            ids = np.concatenate([ids, np.full(cap - n, ids[0])])
            rows = np.concatenate([rows, np.full(cap - n, rows[0])])
        probs, embs = self._serve_fn(mode)(
            self.params, ids[:, None], rows[:, None],
            self._mode_arrays(mode))
        return n, probs, embs

    def predict_nodes(self, ids, mode: int = TEST) -> np.ndarray:
        """Point-query serving: class probabilities [len(ids), C] for
        arbitrary node ids, through the full deterministic eval path
        (PPR-row gather -> device sample/induce -> forward)."""
        n, probs, _ = self._serve_batch(ids, mode)
        return np.asarray(probs)[:n]

    def embed_nodes(self, ids, mode: int = TEST) -> List[np.ndarray]:
        """Point-query embeddings: per-ensemble-branch [len(ids), dim]."""
        n, _, embs = self._serve_batch(ids, mode)
        embs = np.asarray(embs)
        return [embs[i, :n] for i in range(self.num_ensemble)]

    def _emb_chunk_fn(self, mode: int):
        """Chunked scan program producing per-branch embeddings — the
        bulk-export analog of the eval chunk.  One program dispatch per
        chunk instead of per batch: with ~tens-of-ms RPC dispatch
        through a remote TPU runtime the per-batch python loop capped
        bulk export at ~600 subg/s (scripts/serving_bench.py round-2
        measurement); the scan restores cached-epoch throughput."""
        cfgs = tuple(br["cfg"][mode] for br in self.branches)
        kinds = self._branch_kinds(mode)
        key = ("emb", cfgs, kinds)
        if key in self._epoch_fns:
            return self._epoch_fns[key], kinds
        model = self.model
        branch_batches = self._branch_batches_fn(cfgs, kinds)

        def e_step(params, graph, feat_tab, mode_train, rng, x):
            roots, bxs = x
            rng, r_samp = jax.random.split(rng)
            batches, feats = branch_batches(graph, feat_tab, roots,
                                            r_samp, bxs)
            _, emb_ens = model.apply(params, batches, feats,
                                     mode_train=mode_train, train=False)
            return rng, jnp.stack(emb_ens)          # [n_ens, B, dim]

        @jax.jit
        def chunk(params, rng, mode_train, graph, feat_tab, xs):
            rng, embs = jax.lax.scan(
                partial(e_step, params, graph, feat_tab, mode_train),
                rng, xs)
            return rng, embs                        # [C, n_ens, B, dim]

        self._epoch_fns[key] = chunk
        return chunk, kinds

    def embed_full(self, modes=(TRAIN, VALID, TEST)) -> List[np.ndarray]:
        """Per-branch embedding matrices emb[raw node id] for the
        subgraph-ensemble postprocessing (reference main.py:270-282)."""
        assert self.task == "node"
        embs = [np.zeros((self.num_nodes, self.model_cfg.dim), np.float32)
                for _ in range(self.num_ensemble)]
        for md in modes:
            self._ensure_tables(md)
            fn, kinds = self._emb_chunk_fn(md)
            (nb, roots, rows, _labels, _w, _ln, w_np) = self._epoch_arrays(md)
            w_np = w_np.reshape(nb, -1)
            graph, feat_tab = self.graph[md], self.feat_tab
            C = self.chunk_batches if self.chunk_batches > 0 else nb
            n_chunks = -(-nb // C)
            rng = jax.random.PRNGKey(0)
            mt = jnp.asarray(md == TRAIN)
            out_l = []
            for ci in range(n_chunks):
                s, e = ci * C, min((ci + 1) * C, nb)
                pad = C - (e - s)

                def cut(a):
                    sl = a[s:e]
                    if pad:
                        sl = jnp.concatenate(
                            [sl, jnp.repeat(a[s:s + 1], pad, 0)], 0)
                    return sl

                xs = (cut(roots), self._pregather(md, kinds, cut(rows)))
                rng, emb_c = fn(self.params, rng, mt, graph, feat_tab, xs)
                out_l.append(emb_c)
            # host conversion after the loop keeps dispatches async
            emb_all = np.concatenate([np.asarray(o) for o in out_l])[:nb]
            r_all = np.asarray(roots).reshape(nb, -1, self.num_targets)[:, :, 0]
            for ib in range(nb):
                valid = w_np[ib] > 0
                r = r_all[ib]
                for i in range(self.num_ensemble):
                    embs[i][r[valid]] = emb_all[ib, i][valid]
        return embs

    def _profile_chunk_fn(self, mode: int):
        """Sampling-only chunk program returning per-branch reductions
        (hop one-hot composition, node/edge counts) — the device half of
        the full-first-epoch SubgraphProfiler pass."""
        from shadow_gnn_tpu.sampling.batch import hop2onehot
        cfgs = tuple(br["cfg"][mode] for br in self.branches)
        kinds = self._branch_kinds(mode)
        key = ("prof", cfgs, kinds)
        if key in self._epoch_fns:
            return self._epoch_fns[key], kinds
        branch_batches = self._branch_batches_fn(cfgs, kinds)

        def p_step(graph, feat_tab, rng, x):
            roots, w, bxs = x
            rng, r_samp = jax.random.split(rng)
            batches, _ = branch_batches(graph, feat_tab, roots, r_samp, bxs)
            outs = []
            for b in batches:
                valid = (w > 0)
                m = b.node_mask & valid[:, None]
                oh = (hop2onehot(b.hop) * m[..., None]).sum((0, 1))
                nodes = (b.size * valid).sum()
                edges = (b.adj.sum((1, 2)) * valid).sum()
                outs.append((oh, nodes.astype(jnp.float32),
                             edges, valid.sum()))
            return rng, tuple(outs)

        @jax.jit
        def chunk(params, rng, mode_train, graph, feat_tab, xs):
            # params/mode_train unused — signature shared with the eval
            # chunk so _run_profile can mirror _run_chunks' plumbing
            rng, outs = jax.lax.scan(
                partial(p_step, graph, feat_tab), rng, xs)
            return rng, jax.tree_util.tree_map(lambda a: a.sum(0), outs)

        self._epoch_fns[key] = chunk
        return chunk, kinds

    def _profile_epoch(self, mode: int):
        """Accumulate SubgraphProfiler statistics over every batch of one
        epoch-equivalent pass (reference accumulates its whole first
        epoch, main.py:165,188; round-2 sampled only 2 batches)."""
        fn, kinds = self._profile_chunk_fn(mode)
        (nb, roots, rows, _lab, w_dev, _ln, _wn) = self._epoch_arrays(mode)
        graph, feat_tab = self.graph[mode], self.feat_tab
        C = self.chunk_batches if self.chunk_batches > 0 else nb
        n_chunks = -(-nb // C)
        rng = jax.random.PRNGKey(0)
        mt = jnp.asarray(mode == TRAIN)
        acc = None
        for ci in range(n_chunks):
            s, e = ci * C, min((ci + 1) * C, nb)
            pad = C - (e - s)

            def cut(a):
                sl = a[s:e]
                if pad:
                    sl = jnp.concatenate(
                        [sl, jnp.repeat(a[s:s + 1], pad, 0)], 0)
                return sl

            w_c = cut(w_dev)
            if pad:
                w_c = w_c.at[e - s:].set(0.0)
            xs = (cut(roots), w_c, self._pregather(mode, kinds, cut(rows)))
            rng, outs = fn(self.params, rng, mt, graph, feat_tab, xs)
            acc = outs if acc is None else jax.tree_util.tree_map(
                lambda a, b: a + b, acc, outs)
        for i, (oh, nodes, edges, nsub) in enumerate(acc):
            self.profiler.update_stats(i, np.asarray(oh), float(nodes),
                                       float(edges), int(nsub))

    def inference(self, modes=(VALID, TEST)):
        for md in modes:
            self.disable_cache(md)      # one pass only (main.py:204-211)
            stats = self.run_epoch(0, md, status="final")
            self.logger.log_final(md, stats)
        return self.logger.final_summary()
