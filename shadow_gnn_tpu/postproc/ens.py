"""Subgraph-ensemble as postprocessing.

Reference ``shaDow/postproc_ens.py``: train a small model (ensemble
aggregator + 1-layer MLP classifier) on STORED per-branch embedding
matrices produced by previously trained single-branch models.  Here the
post-ensemble model is a flax module trained with a jitted full-batch
scan — the embeddings already live on device, so an epoch is one
program.
"""
from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np
import optax
import flax.linen as nn

from shadow_gnn_tpu import TRAIN, VALID, TEST
from shadow_gnn_tpu.nn.layers import MLPLayer
from shadow_gnn_tpu.nn.respool import EnsembleAggregator


class ModelPostEns(nn.Module):
    """EnsembleAggregator + identity-act MLP classifier
    (postproc_ens.py:18-60)."""

    dim_hid: int
    num_classes: int
    num_ensemble: int
    act: str = "leakyrelu"
    dropout: float = 0.0
    ensemble_dropout: str = "none"

    @nn.compact
    def __call__(self, emb_list, *, train: bool):
        if self.num_ensemble == 1:
            h = emb_list[0]
        else:
            h = EnsembleAggregator(dim_hid=self.dim_hid,
                                   num_ensemble=self.num_ensemble,
                                   dropout=self.dropout, act=self.act,
                                   type_dropout=self.ensemble_dropout)(
                emb_list, train=train)
        return MLPLayer(dim_out=self.num_classes, dropout=0.0, act="I",
                        norm="norm_feat")(h, train=train)


def train_post_ensemble(node_set: Dict[int, np.ndarray],
                        emb_list: List[np.ndarray], label: np.ndarray,
                        arch: dict, params_cfg: dict, seed: int = 0):
    """Train the post-ensembler; returns {mode: accuracy}."""
    num_ens = len(emb_list)
    dim_in = emb_list[0].shape[1]
    sigmoid = arch.get("loss", "softmax") == "sigmoid"
    if label.ndim == 1:
        num_cls = int(label.max()) + 1
        lab_idx = jnp.asarray(label.astype(np.int32))
    else:
        num_cls = label.shape[1]
        lab_idx = jnp.asarray(label.astype(np.float32))
    model = ModelPostEns(dim_hid=arch.get("dim", dim_in),
                         num_classes=num_cls, num_ensemble=num_ens,
                         act=arch.get("act", "leakyrelu"),
                         dropout=float(params_cfg.get("dropout", 0.0)),
                         ensemble_dropout=params_cfg.get("ensemble_dropout",
                                                         "none"))
    embs = [jnp.asarray(e) for e in emb_list]
    rng = jax.random.PRNGKey(seed)
    params = model.init({"params": rng, "dropout": rng},
                        [e[:2] for e in embs], train=False)
    opt = optax.chain(optax.clip_by_global_norm(5.0),
                      optax.adam(float(params_cfg["lr"])))
    opt_state = opt.init(params)
    bs = int(params_cfg["batch_size"])
    tr_idx = np.asarray(node_set[TRAIN])

    # full-graph embedding/label tables enter as ARGUMENTS — captured
    # buffers get serialized into the program on this backend
    @jax.jit
    def train_epoch(params, opt_state, rng, idx_batches, embs, lab_idx):
        def step(carry, idx):
            params, opt_state, rng = carry
            rng, r_do = jax.random.split(rng)
            e_b = [e[idx] for e in embs]
            lab = lab_idx[idx]

            def lf(p):
                logits = model.apply(p, e_b, train=True,
                                     rngs={"dropout": r_do})
                if sigmoid:
                    l = lab.astype(logits.dtype)
                    bce = (jnp.maximum(logits, 0) - logits * l
                           + jnp.log1p(jnp.exp(-jnp.abs(logits))))
                    return bce.mean() * logits.shape[-1]
                l = lab if lab.ndim == 1 else lab.argmax(-1)
                return -jnp.take_along_axis(
                    jax.nn.log_softmax(logits), l[:, None].astype(jnp.int32),
                    axis=-1).mean()

            loss, grads = jax.value_and_grad(lf)(params)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state, rng), loss
        (params, opt_state, _), losses = jax.lax.scan(
            step, (params, opt_state, rng), idx_batches)
        return params, opt_state, losses

    @jax.jit
    def predict_j(params, idx, embs):
        logits = model.apply(params, [e[idx] for e in embs], train=False)
        return jax.nn.sigmoid(logits) if sigmoid else jax.nn.softmax(logits, -1)

    def predict(params, idx):
        return predict_j(params, idx, embs)

    rng_np = np.random.default_rng(seed)
    best = {"valid": -1.0, "params": params}
    for ep in range(int(params_cfg["end"])):
        perm = rng_np.permutation(tr_idx.size)
        nb = tr_idx.size // bs
        idx_b = jnp.asarray(tr_idx[perm[:nb * bs]].reshape(nb, bs).astype(np.int32))
        rng, sub = jax.random.split(rng)
        params, opt_state, _ = train_epoch(params, opt_state, sub, idx_b,
                                           embs, lab_idx)
        va = _acc(predict, params, node_set[VALID], label)
        if va > best["valid"]:
            best = {"valid": va, "params": params}
    params = best["params"]
    return {m: _acc(predict, params, node_set[m], label)
            for m in (TRAIN, VALID, TEST)}


def _acc(predict, params, idx, label):
    idx = np.asarray(idx)
    preds = np.asarray(predict(params, jnp.asarray(idx.astype(np.int32))))
    if label.ndim == 1:
        return float((preds.argmax(1) == label[idx]).mean())
    return float((preds.argmax(1) == label[idx].argmax(1)).mean())


def ensemble_multirun(node_set, emb_pipeline: Dict[str, list], label,
                      arch: dict, params_cfg: dict, repeat: int = 2):
    """Cartesian pairing of stored embedding runs across sampler types
    (postproc_ens.py:165-175)."""
    import itertools
    acc_ens = []
    for es in zip(*list(emb_pipeline.values())):
        es_flat = list(itertools.chain.from_iterable(es))
        for ir in range(repeat):
            acc_ens.append(train_post_ensemble(node_set, es_flat, label,
                                               arch, params_cfg, seed=ir))
    merged = {m: [a[m] for a in acc_ens] for m in (TRAIN, VALID, TEST)}
    return merged
