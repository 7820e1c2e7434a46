"""Device-resident subgraph cache for deterministic samplers.

The reference caches per-root subgraphs of deterministic samplers (PPR)
in host memory and reuses them for every epoch after the first
(``CachedSubgraph`` + the record/reuse state machine,
``minibatch.py:69-91,306-342``, driven by REUSABLE_SAMPLER).  The TPU
equivalent keeps the cache in HBM, bit-packed:

  nodes  [T, N]           int32   sorted member ids
  adj    [T, N, ceil(N/8)] uint8  induced adjacency, bit-packed
  hop    [T, N]           int8    BFS hop annotation (-1 unreachable)
  ppr    [T, N]           f32     PPR annotation
  drnl   [T, N]           int16   DRNL annotation (link task)

A batch step gathers B rows and unpacks bits back into the dense
[B, N, N] block — a few hundred KB of HBM traffic instead of re-running
induction, cutting the per-step sampling cost by ~10x.
"""
from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from shadow_gnn_tpu.sampling.batch import SamplerConfig, SubgraphBatch


class SubgraphCache(NamedTuple):
    """Arrays only (a clean pytree usable as a jit argument — large
    buffers must never be closure-captured: this backend serializes
    captured constants into the compiled program).  Static metadata
    (n_pad, num_nodes) travels separately via SamplerConfig."""

    nodes: jax.Array        # [T, N] int32
    adj_bits: jax.Array     # [T, N, BYTES] uint8
    targets: jax.Array      # [T, Tt] int32 (local)
    hop: jax.Array          # [T, N] int8
    ppr: jax.Array          # [T, N] f32
    drnl: jax.Array         # [T, N] int16


def estimate_bytes(num_roots: int, n_pad: int) -> int:
    bytes_row = n_pad * (4 + math.ceil(n_pad / 8) + 1 + 4 + 2)
    return num_roots * bytes_row


def pack_bits(adj: jax.Array) -> jax.Array:
    """[..., N, N] {0,1} f32 -> [..., N, ceil(N/8)] uint8.

    Tiled layout: bit s of byte b encodes column s*BYTES + b — chosen so
    the Pallas kernel's lane-tiled repeat unpacks without a column
    permutation (ops/pallas_packed.py)."""
    n = adj.shape[-1]
    nbytes = -(-n // 8)
    pad = nbytes * 8 - n
    a = jnp.pad(adj, [(0, 0)] * (adj.ndim - 1) + [(0, pad)])
    a = a.reshape(a.shape[:-1] + (8, nbytes)).astype(jnp.uint8)
    shifts = (1 << jnp.arange(8, dtype=jnp.uint8))[:, None]
    return (a * shifts).sum(-2).astype(jnp.uint8)


def unpack_bits(bits: jax.Array, n: int) -> jax.Array:
    """[..., N, BYTES] uint8 -> [..., N, n] f32 (tiled layout)."""
    shifts = jnp.arange(8, dtype=jnp.uint8)[:, None]
    b = (bits[..., None, :] >> shifts) & 1            # [..., N, 8, BYTES]
    out = b.reshape(bits.shape[:-1] + (-1,))[..., :n]
    return out.astype(jnp.float32)


def build_cache(sample_fn, num_roots: int, roots_all: np.ndarray,
                rows_all: np.ndarray, cfg: SamplerConfig,
                num_nodes: int, chunk: int = 256,
                aux=None) -> SubgraphCache:
    """Run the jitted sampler over every root once, packing results.

    sample_fn(roots [C, T], rows [C, T], aux) -> SubgraphBatch, where
    ``aux`` carries the graph/table device buffers as explicit jit
    arguments (never closure-captured).
    roots_all/rows_all: [num_roots, T]
    """
    n = cfg.n_pad
    t = num_roots
    # adapt the chunk to the induction scratch footprint: rows induction
    # gathers [C, N, R, 32] int32 (lane-padded 4x -> R*512 B/member),
    # cand induction builds [C, E, N] bf16 one-hot pairs — cap either
    # at ~2 GB so one chunk never OOMs HBM (a deg_cap near a power-law
    # max degree otherwise allocates tens of GB at chunk=256)
    from shadow_gnn_tpu.sampling.induction import (ROWS_GATHER_BUDGET,
                                                   rows_gather_bytes)
    if cfg.induction == "rows" and cfg.deg_cap > 0:
        per_root = rows_gather_bytes(1, n, cfg.deg_cap)
    elif cfg.induction in ("cand", "hub") and cfg.cand_cap > 0:
        per_root = 2 * cfg.cand_cap * n * 2
    else:
        per_root = 0
    if per_root > 0:
        chunk = min(chunk, max(8, ROWS_GATHER_BUDGET // per_root))
    nodes = np.empty((t, n), np.int32)
    bits = np.empty((t, n, math.ceil(n / 8)), np.uint8)
    targets = np.empty((t, cfg.num_targets), np.int32)
    hop = np.empty((t, n), np.int8)
    ppr = np.empty((t, n), np.float32)
    drnl = np.empty((t, n), np.int16)

    @jax.jit
    def packed(roots, rows, aux):
        b = sample_fn(roots, rows, aux)
        return (b.nodes, pack_bits(b.adj), b.targets,
                jnp.clip(b.hop, -1, 127).astype(jnp.int8), b.ppr,
                jnp.clip(b.drnl, -2**15, 2**15 - 1).astype(jnp.int16))

    for s in range(0, t, chunk):
        e = min(s + chunk, t)
        pad = chunk - (e - s)
        r = np.concatenate([roots_all[s:e], np.repeat(roots_all[s:s+1],
                                                      pad, 0)])
        rw = np.concatenate([rows_all[s:e], np.repeat(rows_all[s:s+1],
                                                      pad, 0)])
        out = packed(jnp.asarray(r), jnp.asarray(rw), aux)
        nodes[s:e] = np.asarray(out[0])[:e - s]
        bits[s:e] = np.asarray(out[1])[:e - s]
        targets[s:e] = np.asarray(out[2])[:e - s]
        hop[s:e] = np.asarray(out[3])[:e - s]
        ppr[s:e] = np.asarray(out[4])[:e - s]
        drnl[s:e] = np.asarray(out[5])[:e - s]
    return SubgraphCache(
        nodes=jnp.asarray(nodes), adj_bits=jnp.asarray(bits),
        targets=jnp.asarray(targets), hop=jnp.asarray(hop),
        ppr=jnp.asarray(ppr), drnl=jnp.asarray(drnl))


def gather_batch(cache: SubgraphCache, rows: jax.Array, n_pad: int,
                 num_nodes: int, unpack: bool = True) -> SubgraphBatch:
    """rows [B] (cache row per root) -> SubgraphBatch (jit-friendly).

    unpack=False skips materializing the dense [B,N,N] block (the
    packed Pallas aggregation path consumes adj_bits directly)."""
    nodes = cache.nodes[rows]
    bits = cache.adj_bits[rows]
    if unpack:
        adj = unpack_bits(bits, n_pad)
    else:
        adj = jnp.zeros((nodes.shape[0], 1, 1), jnp.float32)
    node_mask = nodes < num_nodes
    return SubgraphBatch(
        nodes=nodes,
        node_mask=node_mask,
        adj=adj,
        targets=cache.targets[rows],
        size=node_mask.sum(-1).astype(jnp.int32),
        hop=cache.hop[rows].astype(jnp.int32),
        ppr=cache.ppr[rows],
        drnl=cache.drnl[rows].astype(jnp.int32),
        overflow=jnp.zeros((), jnp.int32),
        adj_bits=bits,
    )
