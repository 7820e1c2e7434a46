"""Sharded full-graph state for graphs that exceed one chip's HBM.

papers100M-scale support (SURVEY §5.7): the node-feature table (111M x
128 floats = 57GB) is row-sharded across the mesh; each device holds a
contiguous row range.  Subgraph feature gathers become collective
lookups: batch node ids are all-gathered over the mesh axis, every
device serves the rows it owns, and a psum_scatter returns each
device's own batch rows — the all-to-all boundary-feature exchange of
the north-star design, expressed with XLA collectives so it rides ICI.

The per-batch exchanged volume is tiny (B x N x F ~ a few MB), so this
path trades negligible latency for removing the single-chip HBM limit.
"""
from __future__ import annotations

from functools import partial
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def pad_rows_to_shards(tab: np.ndarray, n_shards: int) -> np.ndarray:
    rows = tab.shape[0]
    pad = (-rows) % n_shards
    if pad:
        tab = np.concatenate(
            [tab, np.zeros((pad,) + tab.shape[1:], tab.dtype)], 0)
    return tab


def sharded_feat_gather(feat_local: jax.Array, nodes: jax.Array,
                        axis: str = "dp") -> jax.Array:
    """Inside shard_map: gather rows of a row-sharded table.

    feat_local [N_local, F] — this device's row range
    nodes      [B_local, N] — this device's batch's global node ids
                (out-of-range ids, e.g. the num_nodes sentinel, -> 0)
    Returns    [B_local, N, F]
    """
    n_dev = jax.lax.axis_size(axis)
    n_local = feat_local.shape[0]
    # every device sees every shard's requests
    nodes_all = jax.lax.all_gather(nodes, axis)          # [dp, Bl, N]
    i = jax.lax.axis_index(axis)
    local = nodes_all - i * n_local
    ok = (local >= 0) & (local < n_local)
    vals = feat_local[jnp.clip(local, 0, n_local - 1)]   # [dp, Bl, N, F]
    vals = vals * ok[..., None]
    # each row lives on exactly one shard -> sum-scatter returns each
    # device its own batch's rows
    return jax.lax.psum_scatter(vals, axis, scatter_dimension=0, tiled=False)


def spmd_weighted_loss(cfg_m, logits, labels, w, axis: str):
    """Per-shard PARTIAL of the globally-normalized weighted loss: the
    numerator over this shard's rows divided by the psum'd weight sum.
    ``lax.psum`` of the result is the exact single-chip loss, so
    gradients of the partial psum to the exact global gradient — the
    per-shard-normalize + pmean shortcut deviates whenever a tail
    batch's w=0 padding rows land unevenly across shards."""
    from shadow_gnn_tpu.train.pipeline import weighted_loss_parts
    num, den = weighted_loss_parts(cfg_m, logits, labels, w)
    den_g = jnp.clip(jax.lax.psum(den, axis), 1.0, None)
    return num / den_g


def spmd_train_update(model, opt, cfg_m, axis, params, opt_state,
                      batches, feats, labels, w, r_do, r_de):
    """One SPMD training update shared by every partition step (per-
    batch, epoch-scan, sharded-feature, edge-partitioned): forward +
    backward on this shard's rows, global weighted-loss normalization,
    psum'd gradients, optimizer update.  Returns (params, opt_state,
    global loss, shard logits, psum'd induction-overflow count)."""
    import optax

    def lf(p):
        logits, _ = model.apply(p, batches, feats, mode_train=True,
                                train=True,
                                rngs={"dropout": r_do, "dropedge": r_de})
        return spmd_weighted_loss(cfg_m, logits, labels, w, axis), logits

    (part, logits), grads = jax.value_and_grad(lf, has_aux=True)(params)
    loss = jax.lax.psum(part, axis)
    grads = jax.lax.psum(grads, axis)     # d(global loss)/dp exactly
    updates, opt_state = opt.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    ovf = jax.lax.psum(
        sum(b.overflow for b in batches), axis).astype(jnp.int32)
    return params, opt_state, loss, logits, ovf


def spmd_eval_loss(model, cfg_m, axis, params, batches, feats, labels, w,
                   mode_train):
    """Eval counterpart of spmd_train_update: globally-normalized loss
    + shard logits + psum'd overflow."""
    logits, _ = model.apply(params, batches, feats, mode_train=mode_train,
                            train=False)
    loss = jax.lax.psum(
        spmd_weighted_loss(cfg_m, logits, labels, w, axis), axis)
    ovf = jax.lax.psum(
        sum(b.overflow for b in batches), axis).astype(jnp.int32)
    return loss, logits, ovf


def put_global(mesh: Mesh, tree, spec):
    """device_put in single-process jobs.  In multi-process jobs every
    host passes the FULL host value; replicated leaves go through
    make_array_from_process_local_data whole, while leaves sharded on
    dim 0 are first sliced to this process's contiguous row block
    (device order = process order, leading dim divisible by the process
    count because everything is padded to the mesh size)."""
    sh = spec if isinstance(spec, NamedSharding) else NamedSharding(mesh,
                                                                    spec)
    if jax.process_count() == 1:
        return jax.device_put(tree, sh)
    pi, pc = jax.process_index(), jax.process_count()
    row_sharded = len(sh.spec) > 0 and sh.spec[0] is not None

    def one(x):
        x = np.asarray(x)
        if row_sharded:
            per = x.shape[0] // pc
            x = x[pi * per:(pi + 1) * per]
        return jax.make_array_from_process_local_data(sh, x)

    return jax.tree_util.tree_map(one, tree)


def make_sharded_train_step(trainer, mode: int, n_devices: int,
                            axis: str = "dp",
                            return_logits: bool = False,
                            mesh: Mesh = None, train: bool = True,
                            epoch_scan: bool = False):
    """Full DP training step with a ROW-SHARDED feature table.

    Unlike parallel/dp.py (features replicated), the node-feature table
    here is partitioned across the mesh — the configuration that lets
    papers100M-scale features (57GB) exceed single-chip HBM.  The whole
    step runs under shard_map: sampling + induction per batch shard,
    feature rows fetched with the all-gather/psum_scatter collective,
    gradients pmean-reduced explicitly.

    With ``epoch_scan`` (train only) the step consumes whole-epoch
    ``[nb, B, ...]`` arrays and scans the batches inside ONE program —
    a single device dispatch per TRAIN epoch, same as the single-chip,
    dp, and edge-partitioned paths.

    Returns (step_fn, shard_batch, replicate, feat_sharded).
    """
    import dataclasses as _dc
    from shadow_gnn_tpu.sampling.samplers import sample_subgraphs

    if mesh is None:
        assert len(jax.devices()) >= n_devices, (
            f"need {n_devices} devices, have {len(jax.devices())}")
        devs = np.array(jax.devices()[:n_devices])
        mesh = Mesh(devs, (axis,))
    repl = NamedSharding(mesh, P())
    bshard = NamedSharding(mesh, P(axis))
    trainer._ensure_tables(mode)
    tab = pad_rows_to_shards(trainer.feat_np, n_devices)
    # honour the trainer's feature-storage dtype: bf16 halves both the
    # per-chip table shard (papers100M: 7.1 -> 3.6 GB/chip on a v5e-8)
    # and the all-gather/psum_scatter exchange volume; the model
    # upcasts after the gather as on the single-chip path
    fdt = (jnp.bfloat16
           if getattr(trainer, "feat_dtype", "float32") == "bfloat16"
           else None)
    feat_sharded = put_global(mesh, jnp.asarray(tab, dtype=fdt),
                              P(axis, None))
    graph_meta = trainer.graph[mode]
    graph_arrays = put_global(
        mesh, (graph_meta.indptr, graph_meta.indices), P())
    tables = put_global(mesh, tuple(trainer.tables[mode]), P())
    cfg_m, model, opt = trainer.model_cfg, trainer.model, trainer.opt
    cfgs = tuple(br["cfg"][mode] for br in trainer.branches)

    def _sample_all(r_samp, roots, rows, feat_local, g_arrays, tabs):
        graph = _dc.replace(graph_meta, indptr=g_arrays[0],
                            indices=g_arrays[1])
        batches, feats = [], []
        for i, cfg in enumerate(cfgs):
            r_samp, sub = jax.random.split(r_samp)
            batch = sample_subgraphs(cfg, graph, roots, rng=sub,
                                     table_rows=rows, tables=tabs[i])
            feat = sharded_feat_gather(
                feat_local, jnp.minimum(batch.nodes, trainer.num_nodes - 1),
                axis)
            # no mask multiply here: the model masks the feature block
            # itself (nn/model.py), and an eager pass would force an
            # extra [B, N, F] materialization
            batches.append(batch)
            feats.append(feat)
        return batches, feats

    # multi-process: every host's driver needs the GLOBAL logits for its
    # metric computation (identical on all hosts) — all-gather the tiny
    # [b, C] block in-program and return it replicated
    multi = jax.process_count() > 1

    def _step(params, opt_state, rng, roots, rows, labels, w, feat_local,
              g_arrays, tabs):
        rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))
        rng, r_samp, r_do, r_de = jax.random.split(rng, 4)
        batches, feats = _sample_all(r_samp, roots, rows, feat_local,
                                     g_arrays, tabs)
        params, opt_state, loss, logits, ovf = spmd_train_update(
            model, opt, cfg_m, axis, params, opt_state, batches, feats,
            labels, w, r_do, r_de)
        if return_logits:
            if multi:
                logits = jax.lax.all_gather(logits, axis, axis=0,
                                            tiled=True)
            return params, opt_state, loss, logits, ovf
        return params, opt_state, loss

    def _step_eval(params, rng, roots, rows, labels, w, feat_local,
                   g_arrays, tabs):
        rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))
        rng, r_samp = jax.random.split(rng)
        batches, feats = _sample_all(r_samp, roots, rows, feat_local,
                                     g_arrays, tabs)
        from shadow_gnn_tpu import TRAIN as _TRAIN
        loss, logits, ovf = spmd_eval_loss(model, cfg_m, axis, params,
                                           batches, feats, labels, w,
                                           mode == _TRAIN)
        if multi:
            logits = jax.lax.all_gather(logits, axis, axis=0, tiled=True)
        return loss, logits, ovf

    def _epoch(params, opt_state, rng, roots, rows, labels, w, feat_local,
               g_arrays, tabs):
        """Whole-epoch scan over batches inside ONE shard_map program
        (one device dispatch per TRAIN epoch)."""
        rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))

        def body(carry, xs):
            params, opt_state, rng = carry
            roots_b, rows_b, labels_b, w_b = xs
            rng, r_samp, r_do, r_de = jax.random.split(rng, 4)
            batches, feats = _sample_all(r_samp, roots_b, rows_b,
                                         feat_local, g_arrays, tabs)
            params, opt_state, loss, logits, ovf = spmd_train_update(
                model, opt, cfg_m, axis, params, opt_state, batches,
                feats, labels_b, w_b, r_do, r_de)
            if multi:
                logits = jax.lax.all_gather(logits, axis, axis=0,
                                            tiled=True)
            return (params, opt_state, rng), (loss, logits, ovf)

        (params, opt_state, _), (losses, logits, ovfs) = jax.lax.scan(
            body, (params, opt_state, rng), (roots, rows, labels, w))
        return params, opt_state, losses, logits, ovfs.sum()

    logits_spec = P() if multi else P(axis)
    if train and epoch_scan:
        sharded_ep = jax.jit(jax.shard_map(
            _epoch, mesh=mesh,
            in_specs=(P(), P(), P(), P(None, axis), P(None, axis),
                      P(None, axis), P(None, axis),
                      P(axis, None), P(), P()),
            out_specs=(P(), P(), P(),
                       P() if multi else P(None, axis), P()),
            check_vma=False,
        ))

        def step(params, opt_state, rng, roots, rows, labels, w):
            return sharded_ep(params, opt_state, rng, roots, rows, labels,
                              w, feat_sharded, graph_arrays, tables)
    elif train:
        out_specs = ((P(), P(), P(), logits_spec, P()) if return_logits
                     else (P(), P(), P()))
        sharded = jax.jit(jax.shard_map(
            _step, mesh=mesh,
            in_specs=(P(), P(), P(), P(axis), P(axis), P(axis), P(axis),
                      P(axis, None), P(), P()),
            out_specs=out_specs,
            check_vma=False,
        ))

        def step(params, opt_state, rng, roots, rows, labels, w):
            return sharded(params, opt_state, rng, roots, rows, labels, w,
                           feat_sharded, graph_arrays, tables)
    else:
        sharded_e = jax.jit(jax.shard_map(
            _step_eval, mesh=mesh,
            in_specs=(P(), P(), P(axis), P(axis), P(axis), P(axis),
                      P(axis, None), P(), P()),
            out_specs=(P(), logits_spec, P()),
            check_vma=False,
        ))

        def step(params, rng, roots, rows, labels, w):
            return sharded_e(params, rng, roots, rows, labels, w,
                             feat_sharded, graph_arrays, tables)

    def shard_batch(xs):
        if train and epoch_scan:
            # whole-epoch arrays [nb, B, ...]: batch dim is SECOND
            if jax.process_count() > 1:
                from shadow_gnn_tpu.parallel import multihost as mh
                return tuple(
                    mh.process_local_epoch(mesh, np.asarray(x), axis)
                    for x in xs)
            esh = NamedSharding(mesh, P(None, axis))
            return tuple(jax.device_put(x, esh) for x in xs)
        if jax.process_count() > 1:
            from shadow_gnn_tpu.parallel import multihost as mh
            return tuple(mh.process_local_batch(mesh, np.asarray(x), axis)
                         for x in xs)
        return tuple(jax.device_put(x, bshard) for x in xs)

    def replicate(tree):
        return put_global(mesh, tree, P())

    return step, shard_batch, replicate, feat_sharded


def make_sharded_gather_fn(mesh: Mesh, feat_tab: np.ndarray,
                           axis: str = "dp"):
    """Shard a host feature table over ``mesh`` rows; returns
    (feat_sharded, gather_fn) where gather_fn(nodes_sharded [B, N])
    -> [B, N, F] with batch sharded over the same axis."""
    n_dev = mesh.devices.size
    tab = pad_rows_to_shards(np.asarray(feat_tab), n_dev)
    feat_sharded = jax.device_put(
        jnp.asarray(tab), NamedSharding(mesh, P(axis, None)))

    @partial(jax.shard_map, mesh=mesh, in_specs=(P(axis, None), P(axis, None)),
             out_specs=P(axis, None, None))
    def gather(feat_local, nodes):
        return sharded_feat_gather(feat_local, nodes, axis)

    return feat_sharded, lambda nodes: gather(feat_sharded, nodes)
