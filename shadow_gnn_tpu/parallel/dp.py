"""Data-parallel training over a jax.sharding.Mesh.

The reference is single-process/single-GPU (SURVEY §2: no
torch.distributed anywhere); this module adds the first scale-out axis
the TPU build is designed around: the batch dimension of block-padded
subgraph batches is sharded over a ``('dp',)`` mesh, parameters/graph/
feature tables are replicated, and XLA's GSPMD partitioner inserts the
gradient all-reduce (psum over ICI) automatically from the sharding
annotations — no hand-written collectives on the DP path.

Multi-host extension: the same program runs under
``jax.distributed.initialize`` with a global mesh; the feature table can
be row-sharded (see parallel/partition.py) for graphs whose features
exceed one chip's HBM.
"""
from __future__ import annotations

from typing import Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from shadow_gnn_tpu.train.pipeline import weighted_loss_fn


def make_mesh(n_devices: int) -> Mesh:
    assert len(jax.devices()) >= n_devices, (
        f"need {n_devices} devices, have {len(jax.devices())}")
    devs = np.array(jax.devices()[:n_devices])
    return Mesh(devs, ("dp",))


def make_dp_train_step(trainer, mode: int, n_devices: int,
                       return_logits: bool = False, mesh: Mesh = None,
                       epoch_scan: bool = False):
    """Returns (step_fn, shard_batch, replicate).

    step_fn(params, opt_state, rng, roots, rows, labels, w) runs ONE
    data-parallel training step: on-device sampling + induction +
    forward/backward on each shard of the batch, gradients all-reduced
    by GSPMD, replicated Adam update.  With ``return_logits`` the step
    additionally returns the batch logits (sharded over dp) so the
    driver's metrics/logging pipeline can consume partition-mode
    epochs.

    With ``epoch_scan`` the step consumes WHOLE-EPOCH arrays
    ``[nb, B, ...]`` (batch dim second, sharded over dp) and runs a
    lax.scan over the batches inside ONE program — a single device
    dispatch per TRAIN epoch, same as the single-chip and
    edge-partitioned paths (per-batch dispatches cost ~7ms each
    through the remote-TPU tunnel).  Returns
    ``(params, opt_state, losses[nb], logits[nb, B, C], ovf)``.

    Multi-host: pass ``mesh=multihost.global_dp_mesh()``.  Replicated
    state is then assembled with make_array_from_process_local_data
    (every host holds the full value), and ``shard_batch`` expects each
    process's LOCAL rows of the batch (its ``multihost.process_slice``
    of the global batch) — no host materializes the global batch.
    """
    mesh = mesh if mesh is not None else make_mesh(n_devices)
    multi = jax.process_count() > 1
    repl = NamedSharding(mesh, P())
    bshard = NamedSharding(mesh, P("dp"))

    def _put(tree, sh):
        if not multi:
            return jax.device_put(tree, sh)
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                sh, np.asarray(x)), tree)

    def replicate(tree):
        return _put(tree, repl)

    # pin the closed-over tables/graph replicated so GSPMD doesn't have
    # to guess a layout for the big constants
    g = trainer.graph[mode]
    g.indptr = _put(g.indptr, repl)
    g.indices = _put(g.indices, repl)
    trainer.feat_tab = _put(trainer.feat_tab, repl)
    trainer._ensure_tables(mode)
    for i, t in enumerate(trainer.tables[mode]):
        if t is not None:
            trainer.tables[mode][i] = type(t)(
                _put(t.neighs, repl), _put(t.scores, repl))

    cfg_m = trainer.model_cfg
    model, opt = trainer.model, trainer.opt
    arrays0 = _put(trainer._mode_arrays(mode), repl)

    def _step(params, opt_state, rng, roots, rows, labels, w, arrays):
        rng, r_samp, r_do, r_de = jax.random.split(rng, 4)
        batches, feats = trainer._sample_branch_batches(mode, roots, rows,
                                                        r_samp, arrays)

        def lf(p):
            logits, _ = model.apply(p, batches, feats, mode_train=True,
                                    train=True,
                                    rngs={"dropout": r_do, "dropedge": r_de})
            return weighted_loss_fn(cfg_m, logits, labels, w), logits

        (loss, logits), grads = jax.value_and_grad(lf, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        import optax
        params = optax.apply_updates(params, updates)
        if return_logits:
            ovf = sum(b.overflow for b in batches)
            return params, opt_state, loss, logits, ovf
        return params, opt_state, loss

    def _epoch(params, opt_state, rng, roots, rows, labels, w, arrays):
        """Whole-epoch scan over batches inside ONE program (one device
        dispatch per TRAIN epoch, matching the single-chip and
        edge-partitioned paths)."""
        import optax

        def body(carry, xs):
            params, opt_state, rng = carry
            roots_b, rows_b, labels_b, w_b = xs
            rng, r_samp, r_do, r_de = jax.random.split(rng, 4)
            batches, feats = trainer._sample_branch_batches(
                mode, roots_b, rows_b, r_samp, arrays)

            def lf(p):
                logits, _ = model.apply(
                    p, batches, feats, mode_train=True, train=True,
                    rngs={"dropout": r_do, "dropedge": r_de})
                return weighted_loss_fn(cfg_m, logits, labels_b, w_b), logits

            (loss, logits), grads = jax.value_and_grad(
                lf, has_aux=True)(params)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            ovf = sum(b.overflow for b in batches)
            return (params, opt_state, rng), (loss, logits, ovf)

        (params, opt_state, _), (losses, logits, ovfs) = jax.lax.scan(
            body, (params, opt_state, rng), (roots, rows, labels, w))
        return params, opt_state, losses, logits, ovfs.sum()

    # multi-process: the driver computes metrics on the host from the
    # GLOBAL logits, which no single process could fetch from a
    # dp-sharded output — return them replicated (GSPMD inserts an
    # all-gather of the tiny [b, C] block)
    if epoch_scan:
        eshard = NamedSharding(mesh, P(None, "dp"))
        logits_sh = repl if multi else eshard
        step_inner = jax.jit(
            _epoch,
            in_shardings=(repl, repl, repl, eshard, eshard, eshard, eshard,
                          repl),
            out_shardings=(repl, repl, repl, logits_sh, repl),
        )
    else:
        logits_sh = repl if multi else bshard
        out_sh = ((repl, repl, repl, logits_sh, repl) if return_logits
                  else (repl, repl, repl))
        step_inner = jax.jit(
            _step,
            in_shardings=(repl, repl, repl, bshard, bshard, bshard, bshard,
                          repl),
            out_shardings=out_sh,
        )

    def step(params, opt_state, rng, roots, rows, labels, w):
        return step_inner(params, opt_state, rng, roots, rows, labels, w,
                          arrays0)

    def shard_batch(xs: Tuple):
        if epoch_scan:
            # whole-epoch arrays [nb, B, ...]: batch dim is SECOND; in
            # multi-process jobs each host feeds its process_slice of
            # the batch columns
            if multi:
                from shadow_gnn_tpu.parallel import multihost as mh
                return tuple(mh.process_local_epoch(mesh, np.asarray(x))
                             for x in xs)
            esh = NamedSharding(mesh, P(None, "dp"))
            return tuple(jax.device_put(x, esh) for x in xs)
        if multi:
            from shadow_gnn_tpu.parallel import multihost as mh
            return tuple(mh.process_local_batch(mesh, np.asarray(x))
                         for x in xs)
        return tuple(jax.device_put(x, bshard) for x in xs)

    return step, shard_batch, replicate
