"""Approximate personalized PageRank precompute + top-k tables.

The reference computes per-target approximate PPR with a forward-push
algorithm on the CPU (OpenMP over targets, ``ParallelSampler.cpp:237-344``)
and caches the per-target top-k neighbor/score lists in binary files
(``ParallelSampler.cpp:94-231``).  This module provides

* :func:`ppr_push_host` — a faithful host implementation of the same
  lazy forward-push (numpy; the C++ native library in
  ``native/`` provides the fast multi-threaded path, used when built),
* :func:`ppr_power_device` — the TPU-native alternative: batched lazy
  power iteration as dense/SpMM compute on device, producing the same
  stationary vector that forward-push approximates,
* binary cache IO that is byte-compatible with the reference format so
  precomputed ``ppr_float/{neighs,scores}_*.bin`` files can be reused in
  either direction.

Semantics notes (matching the C++):
* config ``alpha`` is flipped internally: ``alpha_int = 1 - alpha``
  (``cpp:242``), i.e. config alpha=0.85 means teleport prob 0.15;
* the push is "lazy": on settling, half of ``(1-alpha_int)*res`` stays
  at the node (``cpp:286,306``);
* top-k selection sorts by (-score, node_id) so ties break by id
  (``cpp:321-327`` sorts pairs of (-score, id)).
"""
from __future__ import annotations

import os
import struct
from typing import Dict, Optional, Tuple

import numpy as np


# ---------------------------------------------------------------------------
# host forward-push (reference semantics)
# ---------------------------------------------------------------------------

def ppr_push_single(indptr: np.ndarray, indices: np.ndarray, deg: np.ndarray,
                    target: int, alpha_int: float, epsilon: float
                    ) -> Dict[int, float]:
    """Forward-push approximate PPR from one target.

    Returns {node: pi} for every node that was ever pushed ("touched"),
    identical to the C++ ``use_map=False`` branch (cpp:263-317).
    """
    n = indptr.size - 1
    pi = {}
    residue = {target: 1.0}
    # std::set pops the smallest id first -> deterministic push order
    import heapq
    prop = [target]
    in_prop = {target}
    touched = {}
    while prop:
        v = heapq.heappop(prop)
        in_prop.discard(v)
        res = residue.get(v, 0.0)
        pi[v] = pi.get(v, 0.0) + alpha_int * res
        dv = deg[v]
        if dv > 0:
            m = (1.0 - alpha_int) * res / (2.0 * dv)
            for u in indices[indptr[v]:indptr[v + 1]]:
                u = int(u)
                residue[u] = residue.get(u, 0.0) + m
                if residue[u] > epsilon * deg[u] and u not in in_prop:
                    heapq.heappush(prop, u)
                    in_prop.add(u)
        residue[v] = res * (1.0 - alpha_int) / 2.0
        # dv == 0 settles unconditionally (the C++ would spin on isolated
        # nodes; datasets have none, but the guard keeps us total)
        if residue[v] <= epsilon * dv or dv == 0:
            touched[v] = pi[v]
        else:
            if v not in in_prop:
                heapq.heappush(prop, v)
                in_prop.add(v)
    return touched


def _topk_sorted(touched: Dict[int, float], k: int) -> Tuple[np.ndarray, np.ndarray]:
    """Top-k by score, ties broken by smaller node id; sorted descending."""
    if not touched:
        return np.zeros(0, np.int32), np.zeros(0, np.float32)
    ids = np.fromiter(touched.keys(), dtype=np.int64)
    sc = np.fromiter(touched.values(), dtype=np.float64)
    order = np.lexsort((ids, -sc))[: min(k, ids.size)]
    return ids[order].astype(np.int32), sc[order].astype(np.float32)


def ppr_push_host(indptr: np.ndarray, indices: np.ndarray,
                  targets: np.ndarray, k: int, alpha: float, epsilon: float,
                  use_native: bool = True) -> Tuple[list, list]:
    """Per-target approximate PPR; returns (neighs_list, scores_list).

    ``alpha`` is the *config* alpha (e.g. 0.85); flipped internally like
    the reference.  Uses the C++ native library when available.
    """
    alpha_int = 1.0 - alpha
    if use_native:
        try:
            from shadow_gnn_tpu.native import ppr_push_native
            return ppr_push_native(indptr, indices, targets, k, alpha_int, epsilon)
        except (ImportError, OSError):
            pass
    deg = np.diff(indptr).astype(np.int64)
    neighs, scores = [], []
    for t in np.asarray(targets):
        touched = ppr_push_single(indptr, indices, deg, int(t), alpha_int, epsilon)
        ni, si = _topk_sorted(touched, k)
        neighs.append(ni)
        scores.append(si)
    return neighs, scores


# ---------------------------------------------------------------------------
# TPU-native batched power iteration
# ---------------------------------------------------------------------------

def plan_device_ppr(num_nodes: int, num_edges: int,
                    hbm_bytes: Optional[int],
                    want_batch: int = 512, min_batch: int = 256
                    ) -> Tuple[bool, int]:
    """Auto-selection between :func:`ppr_power_device` and the native
    host push: always the push.

    Measured round 4 (v5e, 250k-node power-law proxy): the device power
    iteration precomputes ~44-90 targets/s — its per-iteration
    ``segment_sum`` scatter serializes on TPU — while the round-3
    lazy-heap native push does 3,318 targets/s on a 40x bigger graph
    (BENCH.md).  The device path predates the push rewrite (round-3
    host push was ~450/s at scale and the [N, B] SpMM blocks won);
    after it, the push wins at every measured size, so the planner
    returns host unconditionally.  ``ppr_power_device`` stays available
    via ``use_device_ppr=True`` (Trainer) / ``--device_ppr device``.

    The returned batch is still HBM-fitted for callers that force the
    device path: ~4 live [N, batch] f32 blocks + 12 B/edge arrays must
    fit half the device memory (an unguarded batch=512 at 10M nodes is
    an ~82 GB ask on a 16 GB chip).

    Returns ``(use_device, batch)``.
    """
    budget = 0.5 * float(hbm_bytes if hbm_bytes else 16 << 30)
    avail = budget - 12.0 * num_edges
    b_max = int(max(avail, 0.0) // (16.0 * num_nodes))
    batch = want_batch if b_max >= want_batch else max(b_max, min_batch)
    return False, batch


def device_memory_bytes(device) -> Optional[int]:
    """Best-effort HBM capacity of a jax device (None if unknown)."""
    try:
        stats = device.memory_stats()
    except Exception:
        return None
    if not stats:
        return None
    return stats.get("bytes_limit") or stats.get("bytes_reservable_limit")


def ppr_power_device(indptr: np.ndarray, indices: np.ndarray,
                     targets: np.ndarray, k: int, alpha: float,
                     num_iter: int = 50, batch: int = 512
                     ) -> Tuple[list, list]:
    """Batched lazy-walk PPR by power iteration on device.

    Iterates ``pi <- a*e_t + (1-a) * (pi/2 + P^T pi/2)`` with
    ``P = D^{-1}A`` — the stationary point the forward-push approximates.
    One SpMM per iteration over a [N, batch] block: MXU/HBM-friendly and
    orders of magnitude faster than per-root push for dense target sets.
    Top-k per column computed on device.
    """
    import jax
    import jax.numpy as jnp

    alpha_int = 1.0 - alpha
    n = indptr.size - 1
    deg = np.maximum(np.diff(indptr), 1).astype(np.float32)
    src = np.repeat(np.arange(n, dtype=np.int32), np.diff(indptr))
    dst = indices.astype(np.int32)
    # w[e] = 1/deg[src[e]]; (P^T x)[u] = sum_{e: dst=u} w[e] x[src[e]]
    w = (1.0 / deg[src]).astype(np.float32)
    src_j, dst_j, w_j = jnp.asarray(src), jnp.asarray(dst), jnp.asarray(w)

    # edge arrays enter as ARGUMENTS (captured buffers serialize into
    # the compiled program on this backend — 12 B/edge of constants)
    @jax.jit
    def run_block(src_j, dst_j, w_j, tgt_block):
        e = jax.nn.one_hot(tgt_block, n, dtype=jnp.float32).T  # [N, B]
        def body(pi, _):
            msg = jax.ops.segment_sum(w_j[:, None] * pi[src_j], dst_j, num_segments=n)
            pi = alpha_int * e + (1 - alpha_int) * 0.5 * (pi + msg)
            return pi, None
        pi, _ = jax.lax.scan(body, e * alpha_int, None, length=num_iter)
        topv, topi = jax.lax.top_k(pi.T, k)  # [B, k]
        return topi.astype(jnp.int32), topv

    neighs, scores = [], []
    targets = np.asarray(targets)
    for s in range(0, targets.size, batch):
        blk = targets[s:s + batch]
        pad = batch - blk.size
        blk_p = np.pad(blk, (0, pad))
        ti, tv = run_block(src_j, dst_j, w_j, jnp.asarray(blk_p))
        ti, tv = np.asarray(ti), np.asarray(tv)
        for b in range(blk.size):
            valid = tv[b] > 0
            neighs.append(ti[b][valid])
            scores.append(tv[b][valid])
    return neighs, scores


def ppr_topk_tables(neighs, scores, k: int
                    ) -> Tuple[np.ndarray, np.ndarray]:
    """Pad per-target lists into dense [T, k] tables (pad: id=-1, score=0).

    Dense [T, >=k] inputs (native as_dense / merged shards) pass through
    with a clip."""
    if isinstance(neighs, np.ndarray) and neighs.ndim == 2:
        return (np.ascontiguousarray(neighs[:, :k], np.int32),
                np.ascontiguousarray(np.asarray(scores)[:, :k], np.float32))
    t = len(neighs)
    tab_n = np.full((t, k), -1, dtype=np.int32)
    tab_s = np.zeros((t, k), dtype=np.float32)
    for i, (ni, si) in enumerate(zip(neighs, scores)):
        m = min(k, ni.size)
        tab_n[i, :m] = ni[:m]
        tab_s[i, :m] = si[:m]
    return tab_n, tab_s


# ---------------------------------------------------------------------------
# binary cache, byte-compatible with the reference
# ---------------------------------------------------------------------------

def _trans_tag(is_transductive: bool, variant: str) -> str:
    """'transductive'/'inductive' file tag; a non-empty ``variant``
    (e.g. 'wval' for valedges_as_input) is appended so caches computed
    over a different adjacency never collide with the vanilla ones."""
    tag = "transductive" if is_transductive else "inductive"
    return f"{tag}-{variant}" if variant else tag


def ppr_cache_paths(dir_data: str, name_data: str, is_transductive: bool,
                    mode_str: str, alpha: float, epsilon: float, k: int,
                    variant: str = ""):
    """File naming contract of reference samplers_cpp.py:135-170."""
    str_trans = _trans_tag(is_transductive, variant)
    d = f"{dir_data}/{name_data}/ppr_float"
    suffix = f"{str_trans}_{mode_str}_{alpha}_{epsilon}"
    return (f"{d}/neighs_{suffix}_{k}.bin", f"{d}/scores_{suffix}_{k}.bin")


def find_ppr_cache(dir_data: str, name_data: str, is_transductive: bool,
                   mode_str: str, alpha: float, epsilon: float,
                   k_required: int, variant: str = ""):
    """Accept any cached file with k_meta >= k_required (ref :156-166)."""
    import glob as _glob
    str_trans = _trans_tag(is_transductive, variant)
    d = f"{dir_data}/{name_data}/ppr_float"
    suffix = f"{str_trans}_{mode_str}_{alpha}_{epsilon}"
    for cn in sorted(_glob.glob(f"{d}/neighs_{suffix}_*")):
        k_meta = int(cn.rsplit("_", 1)[-1].split(".bin")[0])
        cs = f"{d}/scores_{suffix}_{k_meta}.bin"
        if k_meta >= k_required and os.path.isfile(cs):
            return cn, cs
    return None, None


def _write_ragged_vec(path: str, lengths: np.ndarray, payload: np.ndarray,
                      k: int, alpha_int: float, epsilon: float):
    """One-shot vectorized ragged writer: assemble the whole file as a
    u32 word buffer (length words scattered to their computed offsets,
    payload filling the gaps) and write it in one ``tofile``.  The
    round-2 per-row ``struct.pack`` loop took hours at 111M rows; this
    is bandwidth-bound (~seconds)."""
    lengths = np.asarray(lengths, dtype=np.int64)
    cnt = lengths.size
    total_words = 4 + cnt + int(lengths.sum())
    arr = np.zeros(total_words, dtype="<u4")
    arr[:4] = np.frombuffer(
        struct.pack("<ffiI", alpha_int, epsilon, k, cnt), "<u4")
    pos = 4 + np.arange(cnt, dtype=np.int64)
    pos[1:] += np.cumsum(lengths[:-1])
    arr[pos] = lengths.astype("<u4")
    mask = np.ones(total_words, bool)
    mask[:4] = False
    mask[pos] = False
    arr[mask] = np.ascontiguousarray(payload).view("<u4")
    arr.tofile(path)


def _ragged_payloads(target_rows: np.ndarray, num_nodes: int, neighs,
                     scores):
    """(lengths[num_nodes], neighs payload, scores payload) in node-id
    row order, from either per-target ragged lists or dense [T, k]
    tables (pad id=-1)."""
    targets = np.asarray(target_rows, dtype=np.int64)
    order = np.argsort(targets, kind="stable")
    lengths = np.zeros(num_nodes, np.int64)
    if isinstance(neighs, np.ndarray) and neighs.ndim == 2:
        ln = (neighs >= 0).sum(1).astype(np.int64)
        lengths[targets] = ln
        sel = (neighs >= 0)[order]
        n_pay = neighs[order][sel].astype("<u4")
        s_pay = np.asarray(scores)[order][sel].astype("<f4")
    else:
        ln = np.fromiter((len(v) for v in neighs), np.int64,
                         count=len(neighs))
        lengths[targets] = ln
        if len(neighs):
            n_pay = np.concatenate(
                [np.asarray(neighs[i]) for i in order]).astype("<u4")
            s_pay = np.concatenate(
                [np.asarray(scores[i]) for i in order]).astype("<f4")
        else:
            n_pay = np.zeros(0, "<u4")
            s_pay = np.zeros(0, "<f4")
    return lengths, n_pay, s_pay


def write_ppr_cache(fname_neighs: str, fname_scores: str, num_nodes: int,
                    target_rows: np.ndarray, neighs, scores,
                    k: int, alpha_config: float, epsilon: float):
    """Write the reference bin format; non-target rows get empty lists.

    Header stores the *internal* alpha (1 - config alpha), matching the
    value the C++ writes after its flip at cpp:242.  ``neighs``/``scores``
    accept per-target ragged lists or dense [T, k] tables (pad id=-1).
    """
    os.makedirs(os.path.dirname(fname_neighs), exist_ok=True)
    alpha_int = 1.0 - alpha_config
    lengths, n_pay, s_pay = _ragged_payloads(target_rows, num_nodes,
                                             neighs, scores)
    _write_ragged_vec(fname_neighs, lengths, n_pay, k, alpha_int, epsilon)
    _write_ragged_vec(fname_scores, lengths, s_pay, k, alpha_int, epsilon)


class RaggedRows:
    """Zero-copy view over one ragged bin file: row i is
    ``buf[pos[i]+1 : pos[i]+1+len_i]`` viewed as ``dtype``, clipped to
    the requested k (the reference's deg_clip, cpp:188-196)."""

    def __init__(self, buf: np.ndarray, pos: np.ndarray,
                 lengths: np.ndarray, k: int, dtype: str):
        self._buf = buf
        self._pos = pos
        self.lengths = lengths
        self.k = k
        self.dtype = dtype

    def __len__(self):
        return self._pos.size

    def __getitem__(self, i: int) -> np.ndarray:
        l = min(int(self.lengths[i]), self.k)
        p = int(self._pos[i]) + 1
        return self._buf[p:p + l].view(self.dtype)


def _ragged_offsets(buf: np.ndarray, cnt: int) -> np.ndarray:
    try:
        from shadow_gnn_tpu.native import ragged_offsets
        return ragged_offsets(buf, cnt)
    except (ImportError, OSError):
        pos = np.empty(cnt, np.int64)
        p = 4
        for i in range(cnt):
            pos[i] = p
            p += 1 + int(buf[p])
        return pos


def read_ppr_cache(fname_neighs: str, fname_scores: str, k: int,
                   alpha_config: float, epsilon: float
                   ) -> Optional[Tuple[RaggedRows, RaggedRows]]:
    """Read the bin cache; None on meta mismatch (ref cpp:145-231).

    Returns full-length (num_nodes) row views, each clipped to k like
    the reference's deg_clip.  The file parses as one bulk read + a
    native offset scan instead of 2*num_nodes struct.unpack calls.
    """
    if not (os.path.isfile(fname_neighs) and os.path.isfile(fname_scores)):
        return None
    alpha_int = 1.0 - alpha_config

    def read_file(path, np_dtype):
        buf = np.fromfile(path, dtype="<u4")
        a, e, k_, cnt = struct.unpack("<ffiI", buf[:4].tobytes())
        if abs(a - np.float32(alpha_int)) > 1e-7 or e > 1.1 * epsilon \
                or e < 0.9 * epsilon or k_ < k:
            return None
        pos = _ragged_offsets(buf, cnt)
        return RaggedRows(buf, pos, buf[pos].astype(np.int64), k, np_dtype)
    nv = read_file(fname_neighs, "<i4")
    if nv is None:
        return None
    sv = read_file(fname_scores, "<f4")
    if sv is None:
        return None
    return nv, sv


# ---------------------------------------------------------------------------
# multi-host sharded precompute (papers100M path)
# ---------------------------------------------------------------------------
#
# The push is embarrassingly parallel over targets; the reference caps it
# at one host's OpenMP threads (ParallelSampler.cpp:255).  Here each host
# computes a round-robin slice of the target set (targets[shard::n])
# and writes a partial .npz; any host then merges the partials into the
# standard reference-format bin pair with the vectorized writer.

def shard_targets(targets: np.ndarray, shard: int, n_shards: int
                  ) -> np.ndarray:
    """Round-robin slice (balances hub-adjacent targets across hosts)."""
    assert 0 <= shard < n_shards
    return np.asarray(targets)[shard::n_shards]


def ppr_shard_path(fname_neighs: str, shard: int, n_shards: int) -> str:
    return f"{fname_neighs}.shard{shard}of{n_shards}.npz"


def write_ppr_shard(path: str, targets_sel: np.ndarray, tab_n: np.ndarray,
                    tab_s: np.ndarray, k: int, alpha_config: float,
                    epsilon: float):
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, targets=np.asarray(targets_sel, np.int64),
             neighs=np.asarray(tab_n, np.int32),
             scores=np.asarray(tab_s, np.float32),
             meta=np.asarray([1.0 - alpha_config, epsilon, k], np.float64))


def merge_ppr_shards(fname_neighs: str, fname_scores: str, num_nodes: int,
                     n_shards: int, k: int, alpha_config: float,
                     epsilon: float, cleanup: bool = True):
    """Assemble shard .npz partials into the standard bin cache pair."""
    tg, nn, ss = [], [], []
    for s in range(n_shards):
        p = ppr_shard_path(fname_neighs, s, n_shards)
        z = np.load(p)
        meta = z["meta"]
        assert abs(meta[0] - (1.0 - alpha_config)) < 1e-9 and \
            abs(meta[1] - epsilon) < 1e-12 and int(meta[2]) == k, \
            f"shard {p} meta mismatch: {meta}"
        tg.append(z["targets"])
        nn.append(z["neighs"])
        ss.append(z["scores"])
    targets = np.concatenate(tg)
    assert np.unique(targets).size == targets.size, "overlapping shards"
    write_ppr_cache(fname_neighs, fname_scores, num_nodes, targets,
                    np.vstack(nn), np.vstack(ss), k, alpha_config, epsilon)
    if cleanup:
        for s in range(n_shards):
            os.remove(ppr_shard_path(fname_neighs, s, n_shards))
