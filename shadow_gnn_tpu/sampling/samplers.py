"""Device-side subgraph samplers.

TPU-native equivalents of the four OpenMP samplers in the reference's
C++ engine (``ParallelSampler.cpp``): each is a jitted gather program
over the HBM-resident CSR producing fixed-capacity node sets, which
:mod:`shadow_gnn_tpu.sampling.induction` turns into dense subgraph
blocks.

sampler      reference                     here
-----------  ----------------------------  --------------------------------
nodeIID      cpp:498-508                   targets only
khop         cpp:510-556                   per-level budgeted random gather
ppr          cpp:565-595                   top-k table row gather
ppr_st       cpp:603-650                   exponential-race top-k
                                           (u^(1/s) trick, cpp:630-644,
                                           via sorted log(u)/s keys)
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from shadow_gnn_tpu.data.graph import DeviceGraph
from shadow_gnn_tpu.sampling.batch import SamplerConfig, SubgraphBatch, sort_dedup
from shadow_gnn_tpu.sampling.induction import induce


class PPRTables(NamedTuple):
    """Per-target top-k PPR tables, row-aligned with the mode's target set.

    neighs [T, k] int32 (pad -1) — neighbor ids sorted by descending score
    scores [T, k] f32   (pad 0)
    """

    neighs: jax.Array
    scores: jax.Array


def _dedup_with_scores(ids: jax.Array, scores: jax.Array, sentinel: int,
                       n_pad: int) -> Tuple[jax.Array, jax.Array]:
    """Sort ids ascending, dedup keeping the max score per id, pad to n_pad."""
    # ONE lexicographic (id asc, score desc) lax.sort replaces the
    # two-pass (score-desc argsort, then stable-by-id argsort) ordering
    # and its four take_along gathers.  These sorts run every step on
    # the cache-ineligible samplers (ppr_st / link tasks) and the
    # [B, ~2k] sort chains are latency-bound on TPU, so one fewer wide
    # sort+gather round is ~a third of the dedup cost.  (Ties in
    # (id, score) are identical entries — unordered among themselves,
    # same dedup result.)
    ids2, _, sc2 = jax.lax.sort((ids, -scores, scores), dimension=-1,
                                num_keys=2)
    prev = jnp.concatenate([jnp.full_like(ids2[..., :1], -1), ids2[..., :-1]], -1)
    dup = ids2 == prev
    ids3 = jnp.where(dup, sentinel, ids2)
    sc3 = jnp.where(dup, 0.0, sc2)
    m = ids.shape[-1]
    if m > n_pad:
        # score-aware truncation: when more than n_pad unique ids survive,
        # keep the highest-score entries (targets carry score<0 = always
        # keep; sentinels rank last) instead of the lowest node ids
        pri = jnp.where(ids3 == sentinel, -jnp.inf,
                        jnp.where(sc3 < 0, jnp.inf, sc3))
        # ties in pri are either identical (id, score) entries or
        # sentinels (id identical too) — order among them is irrelevant
        _, ids3, sc3 = jax.lax.sort((-pri, ids3, sc3), dimension=-1,
                                    num_keys=1)
        ids3 = ids3[..., :n_pad]
        sc3 = sc3[..., :n_pad]
    # final ascending-id order; within a duplicate id group every
    # surviving entry is (sentinel, 0) except the kept one, and ids are
    # unique otherwise, so single-key ordering is sufficient
    ids4, sc4 = jax.lax.sort((ids3, sc3), dimension=-1, num_keys=1)
    if m < n_pad:
        pad = [(0, 0)] * (ids.ndim - 1) + [(0, n_pad - m)]
        ids4 = jnp.pad(ids4, pad, constant_values=sentinel)
        sc4 = jnp.pad(sc4, pad)
    return ids4, sc4


def _ppr_keep_mask(scores: jax.Array, avail: jax.Array, threshold: float,
                   k_rule: Optional[int] = None) -> jax.Array:
    """Threshold cut of cpp:583-586: keep entry i while
    scores[i]/max_ppr >= threshold, where max_ppr = scores[1] (or 0 when
    fewer than 2 entries, which keeps nothing beyond the target).

    ``k_rule`` caps the count independently of the table width — the
    stochastic sampler counts over min(k, avail) of a 2k-entry pool
    (cpp:611-626 with the k_required=2k table of samplers_ensemble
    :226-238)."""
    k = scores.shape[-1]
    idx = jnp.arange(k)
    cap = avail if k_rule is None else jnp.minimum(avail, k_rule)
    in_range = idx[None, :] < cap[:, None]
    if k >= 2:
        # size_neigh = min(k, avail) gates the max_ppr read (cpp:577-581)
        max_ppr = jnp.where(cap > 1, scores[:, 1], 0.0)
    else:
        max_ppr = jnp.zeros(scores.shape[:-1], scores.dtype)
    pass_thresh = (max_ppr[:, None] > 0) & (
        scores >= threshold * max_ppr[:, None]
    )
    return in_range & pass_thresh


def _table_rows(tables: Optional[PPRTables], table_rows: Optional[jax.Array],
                table_slices) -> Tuple[jax.Array, jax.Array]:
    """Per-target table rows, either gathered from the full per-mode
    table ([T_mode, k] buffers) or pre-gathered outside the program
    ([B, T, k] slices).  The pre-gathered form makes the epoch program's
    shapes independent of the mode's target count, so one compiled
    program serves TRAIN/VALID/TEST alike (compiles on this backend cost
    minutes PER PROGRAM — fewer distinct programs is the lever)."""
    if table_slices is not None:
        n, s = table_slices
        return n.reshape(-1, n.shape[-1]), s.reshape(-1, s.shape[-1])
    return (tables.neighs[table_rows.reshape(-1)],
            tables.scores[table_rows.reshape(-1)])


def sample_nodes_ppr(cfg: SamplerConfig, graph: DeviceGraph,
                     roots: jax.Array, table_rows: jax.Array,
                     tables: PPRTables, table_slices=None
                     ) -> Tuple[jax.Array, jax.Array]:
    """Deterministic top-k PPR scope (cpp:565-595).

    roots       [B, T] global target ids
    table_rows  [B, T] row index of each target in ``tables``
    """
    b, t = roots.shape
    neighs, scores = _table_rows(tables, table_rows, table_slices)
    if neighs.shape[-1] > cfg.k:
        # wider table (ppr_st eval flip carries a 2k pool): only the
        # first k positions can pass the positional keep mask below, so
        # the dedup sorts run at half width — exact, rows are
        # score-descending with -1 padding last
        neighs, scores = neighs[..., :cfg.k], scores[..., :cfg.k]
    avail = (neighs >= 0).sum(-1)
    # k_rule caps the deterministic scope at top-k even when the table is
    # wider (ppr_st branches carry 2k pools and VALID/TEST falls back to
    # this sampler; the reference reads min(k, table size) rows,
    # cpp:575-586 with the eval sampler built at the original k,
    # minibatch.py:366-370)
    keep = _ppr_keep_mask(scores, avail, cfg.threshold, k_rule=cfg.k)
    sent = graph.num_nodes
    ids = jnp.where(keep, neighs, sent).reshape(b, -1)
    sc = jnp.where(keep, scores, 0.0).reshape(b, -1)
    # the target itself is always in scope (cpp:574: nodes_touched[t]=-1,
    # later overwritten by its own table score via the map)
    ids = jnp.concatenate([roots, ids], axis=-1)
    sc = jnp.concatenate([jnp.full((b, t), -1.0), sc], axis=-1)
    return _dedup_with_scores(ids, sc, sent, cfg.n_pad)


def sample_nodes_ppr_st(cfg: SamplerConfig, graph: DeviceGraph,
                        roots: jax.Array, table_rows: jax.Array,
                        tables: PPRTables, rng: jax.Array,
                        table_slices=None) -> Tuple[jax.Array, jax.Array]:
    """Stochastic PPR scope (cpp:603-650): sample ``sample_size`` table
    entries with probability ~ score, via the exponential race
    u^(1/s) (equivalently top-k of log(u)/s).

    Deviation from the C++: the target is force-included.  The C++ does
    not add it explicitly and relies on the map's operator[] default if
    the target loses the race (which would silently alias local node 0);
    forcing inclusion is strictly more correct.
    """
    b, t = roots.shape
    neighs, scores = _table_rows(tables, table_rows, table_slices)
    avail = (neighs >= 0).sum(-1)
    # sample_size counts over min(k, avail); the counting loop increments
    # BEFORE the threshold break (cpp:617-623), so the first failing entry
    # is still counted — hence +1 clamped back to min(k, avail)
    n_pass = _ppr_keep_mask(scores, avail, cfg.threshold, cfg.k).sum(-1)
    n_keep = jnp.minimum(n_pass + 1, jnp.minimum(avail, cfg.k))
    u = jax.random.uniform(rng, scores.shape, minval=1e-12, maxval=1.0)
    key = jnp.where(scores > 0, jnp.log(u) / jnp.maximum(scores, 1e-30),
                    -jnp.inf)
    # one lax.sort carries ids+scores through the race ordering (best
    # first) instead of argsort + two take_along gathers
    _, ids_r, sc_r = jax.lax.sort((-key, neighs, scores), dimension=-1,
                                  num_keys=1)
    if ids_r.shape[-1] > cfg.k:
        # n_keep <= min(avail, k): race losers beyond rank k can never
        # be selected — slicing halves the dedup sort width (the 2k
        # pool only widens the RACE, not the scope) and keeps the
        # concat width within n_pad (no truncation sort pass).  Exact.
        ids_r, sc_r = ids_r[..., :cfg.k], sc_r[..., :cfg.k]
    rank = jnp.arange(ids_r.shape[-1])[None, :]
    sel = rank < n_keep[:, None]
    sent = graph.num_nodes
    ids_sel = jnp.where(sel, ids_r, sent)
    sc_sel = jnp.where(sel, sc_r, 0.0)
    ids = ids_sel.reshape(b, -1)
    sc = sc_sel.reshape(b, -1)
    ids = jnp.concatenate([roots, ids], axis=-1)
    sc = jnp.concatenate([jnp.full((b, t), -1.0), sc], axis=-1)
    return _dedup_with_scores(ids, sc, sent, cfg.n_pad)


def sample_nodes_khop(cfg: SamplerConfig, graph: DeviceGraph,
                      roots: jax.Array, rng: jax.Array
                      ) -> Tuple[jax.Array, jax.Array]:
    """Budgeted k-hop expansion (cpp:510-556).

    Per level, each frontier node contributes all its neighbors when
    deg <= budget, else ``budget`` uniform picks with replacement — the
    same distribution as the C++ ``rand()%deg`` loop.  Levels are
    deduped before expansion (the C++ frontier is a std::set).
    """
    sent = graph.num_nodes
    b, t = roots.shape
    budget = cfg.budget
    assert budget > 0, "device khop requires a positive budget"
    levels = [roots]
    cur = roots
    for lvl in range(cfg.depth):
        rng, sub = jax.random.split(rng)
        v = jnp.minimum(cur, sent - 1)
        valid = cur < sent
        lo = graph.indptr[v]
        deg = graph.indptr[v + 1] - lo
        r = jax.random.randint(sub, cur.shape + (budget,), 0, 1 << 30)
        j = jnp.arange(budget)[None, None, :]
        off = jnp.where(deg[..., None] <= budget, j, r % jnp.maximum(deg[..., None], 1))
        take = valid[..., None] & (off < deg[..., None])
        nbr = graph.indices[jnp.clip(lo[..., None] + off, 0, graph.num_edges - 1)]
        nxt = jnp.where(take, nbr, sent).reshape(b, -1)
        nxt = sort_dedup(nxt, sent)          # per-level set semantics
        levels.append(nxt)
        cur = nxt
    ids = jnp.concatenate(levels, axis=-1)
    sc = jnp.zeros_like(ids, dtype=jnp.float32)
    return _dedup_with_scores(ids, sc, sent, cfg.n_pad)


def sample_nodes_iid(cfg: SamplerConfig, graph: DeviceGraph, roots: jax.Array
                     ) -> Tuple[jax.Array, jax.Array]:
    """nodeIID (cpp:498-508): scope = the targets themselves."""
    sent = graph.num_nodes
    sc = jnp.zeros_like(roots, dtype=jnp.float32)
    return _dedup_with_scores(roots, sc, sent, cfg.n_pad)


def sample_subgraphs(cfg: SamplerConfig, graph: DeviceGraph,
                     roots: jax.Array, rng: Optional[jax.Array] = None,
                     table_rows: Optional[jax.Array] = None,
                     tables: Optional[PPRTables] = None,
                     table_slices=None) -> SubgraphBatch:
    """Sample + induce one batch of subgraphs (jit-friendly)."""
    if cfg.method == "ppr":
        nodes, ppr_vals = sample_nodes_ppr(cfg, graph, roots, table_rows,
                                           tables, table_slices)
    elif cfg.method == "ppr_st":
        nodes, ppr_vals = sample_nodes_ppr_st(cfg, graph, roots, table_rows,
                                              tables, rng, table_slices)
    elif cfg.method == "khop":
        nodes, ppr_vals = sample_nodes_khop(cfg, graph, roots, rng)
    elif cfg.method == "nodeIID":
        nodes, ppr_vals = sample_nodes_iid(cfg, graph, roots)
    else:
        raise ValueError(cfg.method)
    return induce(graph, nodes, ppr_vals, roots, cfg)


def build_sampler(cfg: SamplerConfig, graph: DeviceGraph,
                  tables: Optional[PPRTables] = None):
    """Return a jitted ``(roots, rng, table_rows) -> SubgraphBatch``.

    graph/tables enter the jitted program as arguments (DeviceGraph is
    a registered pytree), never as closure constants."""

    @jax.jit
    def fn_inner(graph, tables, roots, rng, table_rows):
        return sample_subgraphs(cfg, graph, roots, rng=rng,
                                table_rows=table_rows, tables=tables)

    def fn(roots, rng=None, table_rows=None):
        r = jax.random.PRNGKey(0) if rng is None else rng
        return fn_inner(graph, tables, roots, r, table_rows)

    return fn
