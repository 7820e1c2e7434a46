"""Pallas TPU kernel: fused masked GAT attention over subgraph blocks.

The XLA GAT path (nn/layers.py:GATConv) materializes several
``[B, N, N, H]`` f32 score tensors in HBM (raw scores, masked scores,
exp terms) — ~170 MB each at the papers100M leaderboard shape
(B=64, N=408, H=4) — and the measured step is bandwidth-bound on that
traffic (BENCH.md: 2.7-5.8% MFU, top trace ops are elementwise
fusions over the score chains).

This kernel exploits the shaDow property that subgraph blocks are
SMALL (N <= ~512): one batch element's attention problem — ALL heads
when they fit the ~16 MB VMEM budget (see _head_block), else one head
per grid step — lives entirely in VMEM.  In the head-blocked mode the
adjacency blocks are fetched and masked once for all H heads and the
per-head dots queue back-to-back on the MXU.  Per head it computes

    S[i,j]  = att_self[i] + att_neigh[j]            (scores)
    S_m     = where(adj_struct > 0, S, -inf)        (structural mask)
    e       = exp(S_m - rowmax(S_m)) * adj_norm     (dropedge via values)
    out[i]  = (e @ v)[i] / clip(sum_j e[i,j], 1e-10)

with every [N, N] intermediate living in registers/VMEM — only the
adjacency blocks, the value block and the output round-trip HBM.
Score-tensor HBM traffic drops from O(B*N*N*H) x several passes to
zero.

Semantics are bit-compatible with the dense chain in
``nn/layers.py:GATConv.__call__`` (reference shaDow/layers.py:539-645):
same masking, same finite-guarded row max, same 1e-10 denominator
clip, same post-aggregation division.  ``GATScatterConv``
(layers.py:648-744 semantics: edge score depends only on the source)
reuses the kernel with ``att_self = 0``.

Precision levels (both opt-in, default exact f32):
  bf16        — MXU dots in single-pass bf16 with f32 accumulation
                (the ``--matmul_precision bfloat16`` trade)
  bf16_scores — additionally run the exp / mask-multiply score chain in
                bf16 with an f32 row-sum denominator.  Halves the VPU
                and VMEM cost of the [N, N] chain, which dominates at
                papers100M shapes where the dots are already fast;
                max relative error vs the f32 chain is bounded by bf16
                rounding of exp in [0, 1] (~0.4%).  Requires bf16.

Backward: custom VJP, flash-attention style — recompute e from the
saved inputs (two [N,N]x[N,dh] MXU dots per head):

    de[i,j]     = (g[i].v[j] - g[i].out[i]) / D[i]
    ds          = e * de          (rowsum(ds) == 0, so the gradient
                                   through the row max vanishes exactly)
    d att_self  = rowsum(ds)      d att_neigh = colsum(ds)
    d v         = P^T @ g         (P = e / D)

Gradients flow to att_self / att_neigh / values; the adjacency blocks
are data (zero cotangents, DCE'd by XLA).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _scores(a_s, a_n, adjs, adjn, bf16_scores):
    """Shared fwd/bwd score math for one (batch, head) block.

    a_s, a_n: [1, N] f32;  adjs, adjn: [N, N] f32.
    Returns (e [N, N] (bf16 when bf16_scores), denom [N, 1] f32)."""
    s = jnp.transpose(a_s) + a_n                       # [N, 1] + [1, N]
    s_m = jnp.where(adjs > 0.0, s, -jnp.inf)
    rm = jnp.max(s_m, axis=1, keepdims=True)           # [N, 1]
    rm = jnp.where(jnp.isfinite(rm), rm, 0.0)
    if bf16_scores:
        x = (s_m - rm).astype(jnp.bfloat16)
        e = jnp.exp(x) * adjn.astype(jnp.bfloat16)     # exp(-inf) = 0
        dn = jnp.sum(e.astype(jnp.float32), axis=1, keepdims=True)
    else:
        e = jnp.exp(s_m - rm) * adjn
        dn = jnp.sum(e, axis=1, keepdims=True)
    return e, jnp.clip(dn, 1e-10, None)


def _fwd_kernel(a_s_ref, a_n_ref, v_ref, adjn_ref, adjs_ref, out_ref, *,
                bf16, bf16_scores, nh):
    adjn = adjn_ref[0]
    adjs = adjs_ref[0]
    for j in range(nh):
        e, dn = _scores(a_s_ref[0, j], a_n_ref[0, j], adjs, adjn,
                        bf16_scores)
        v = v_ref[0, j]
        if bf16:
            v = v.astype(jnp.bfloat16)
            if e.dtype != jnp.bfloat16:
                e = e.astype(jnp.bfloat16)
        out = jnp.dot(e, v, preferred_element_type=jnp.float32)
        out_ref[0, j] = out / dn


def _bwd_kernel(a_s_ref, a_n_ref, v_ref, adjn_ref, adjs_ref, out_ref, g_ref,
                das_ref, dan_ref, dv_ref, *, bf16, bf16_scores, nh):
    adjn = adjn_ref[0]
    adjs = adjs_ref[0]
    for j in range(nh):
        e, dn = _scores(a_s_ref[0, j], a_n_ref[0, j], adjs, adjn,
                        bf16_scores)
        p = e.astype(jnp.float32) / dn                 # [N, N]
        v = v_ref[0, j]
        g = g_ref[0, j]
        o = out_ref[0, j]
        if bf16:
            pd, gd, vd = (p.astype(jnp.bfloat16), g.astype(jnp.bfloat16),
                          v.astype(jnp.bfloat16))
        else:
            pd, gd, vd = p, g, v
        # dv[j] = sum_i P[i,j] g[i]  — contract dim 0 (P^T @ g)
        dv = jax.lax.dot_general(pd, gd, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        # gv[i,j] = g[i] . v[j]  — contract the feature dims
        gv = jax.lax.dot_general(gd, vd, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        r = jnp.sum(g * o, axis=1, keepdims=True)      # [N, 1]
        ds = p * (gv - r)                              # [N, N]
        das_ref[0, j] = jnp.transpose(jnp.sum(ds, axis=1, keepdims=True))
        dan_ref[0, j] = jnp.sum(ds, axis=0, keepdims=True)
        dv_ref[0, j] = dv


def _head_block(h, n, dh, bwd: bool) -> int:
    """Heads per grid step, fitted to the ~16 MB scoped-VMEM budget.

    Unrolling all H heads in one grid step fetches/masks the adjacency
    blocks once and queues the per-head MXU dots back to back — but the
    compiler keeps ~6 live [N, N] f32 intermediates per unrolled head
    in the backward (measured: 17.87 MB scoped at B=64/H=4/N=408 — an
    OOM against the 16 MB limit).  The block is the LARGEST DIVISOR of
    H whose estimate fits the budget — any value in [1, H], not just
    all-or-one: the adjacency is re-fetched once per block, so a
    2-of-4 block halves that traffic vs a per-head grid."""
    per_head = (6 if bwd else 4) * n * n * 4
    shared = 2 * n * n * 4 + (4 if bwd else 2) * n * dh * 4
    budget = 12 * 2**20
    # largest divisor of h that fits: at the papers shape (N=408, H=4)
    # all-heads is a compile OOM but PAIRS fit — halving the adjacency
    # refetch traffic vs the old all-or-one fallback
    for cand in range(h, 0, -1):
        if h % cand == 0 and cand * per_head + shared <= budget:
            return cand
    return 1


def _specs(b, h, n, dh, h_blk):
    # TPU lowering requires every block's last two dims to be divisible
    # by (8, 128) or equal to the array dims — hence the explicit
    # singleton axis on the att arrays ([B, H, 1, N]) and the
    # head-major value layout ([B, H, N, dh]): all blocks then cover
    # their trailing dims exactly, for ANY head dim.  Two measured
    # alternatives LOSE to this layout despite the ~4 ms
    # f32[128,152,512] layout copies XLA inserts around the call
    # (copies were 32% of the products_gat5 epoch trace): a flat
    # [B, N, H*dh] layout cannot lower when dh % 128 != 0 (papers
    # dh=200) and is 1.7x slower at products where it can; native
    # [B, N, H, dh] blocks with in-kernel head slicing lower everywhere
    # but run 15% slower at papers (strided sublane access beats the
    # copies it saves).  Grid is (batch,) with all heads riding along
    # when they fit in VMEM (see _head_block), else (batch, heads).
    att = pl.BlockSpec((1, h_blk, 1, n), lambda i, j=0: (i, j, 0, 0))
    val = pl.BlockSpec((1, h_blk, n, dh), lambda i, j=0: (i, j, 0, 0))
    adj = pl.BlockSpec((1, n, n), lambda i, j=0: (i, 0, 0))
    grid = (b,) if h_blk == h else (b, h // h_blk)
    return att, val, adj, grid


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def gat_attention_hm(att_self: jax.Array, att_neigh: jax.Array,
                     values: jax.Array, adj_norm: jax.Array,
                     adj_struct: jax.Array, bf16: bool = False,
                     bf16_scores: bool = False) -> jax.Array:
    """Head-major fused masked-softmax attention aggregation.

    att_self, att_neigh: [B, H, N] f32 per-node score terms
    values:              [B, H, N, dh] (f32, or bf16 with ``bf16=True``)
    adj_norm:            [B, N, N] f32 dropedge-zeroed 0/1 adjacency
    adj_struct:          [B, N, N] f32 structural 0/1 adjacency
    Returns the aggregated [B, H, N, dh] f32 block (division by the
    clipped denominator included).  All operands and results stay in
    the kernel's native head-major layout — no transposes inside the
    VJP boundary, so the only layout copies in a training step are the
    caller's conversions at the edges (fwd value/out, bwd g/dv).  See
    the module docstring for the ``bf16`` / ``bf16_scores`` levels.
    """
    assert not (bf16_scores and not bf16), "bf16_scores requires bf16"
    b, h, n = att_self.shape
    dh = values.shape[-1]
    h_blk = _head_block(h, n, dh, bwd=False)
    att, val, adj, grid = _specs(b, h, n, dh, h_blk)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, bf16=bf16, bf16_scores=bf16_scores,
                          nh=h_blk),
        grid=grid,
        in_specs=[att, att, val, adj, adj],
        out_specs=val,
        out_shape=jax.ShapeDtypeStruct((b, h, n, dh), jnp.float32),
        interpret=jax.default_backend() == "cpu",
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * n * n * dh,
            bytes_accessed=b * (2 * n * n + 2 * h * n * dh + 2 * h * n) * 4,
            transcendentals=b * h * n * n),
    )(att_self[:, :, None, :], att_neigh[:, :, None, :],
      values, adj_norm, adj_struct)


def _fwd_hm(att_self, att_neigh, values, adj_norm, adj_struct, bf16,
            bf16_scores):
    out = gat_attention_hm(att_self, att_neigh, values, adj_norm,
                           adj_struct, bf16, bf16_scores)
    return out, (att_self, att_neigh, values, adj_norm, adj_struct, out)


def _bwd_hm(bf16, bf16_scores, res, g):
    att_self, att_neigh, values, adj_norm, adj_struct, out = res
    b, h, n = att_self.shape
    dh = values.shape[-1]
    h_blk = _head_block(h, n, dh, bwd=True)
    att, val, adj, grid = _specs(b, h, n, dh, h_blk)
    das, dan, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, bf16=bf16, bf16_scores=bf16_scores,
                          nh=h_blk),
        grid=grid,
        in_specs=[att, att, val, adj, adj, val, val],
        out_specs=(att, att, val),
        out_shape=(jax.ShapeDtypeStruct((b, h, 1, n), jnp.float32),
                   jax.ShapeDtypeStruct((b, h, 1, n), jnp.float32),
                   jax.ShapeDtypeStruct((b, h, n, dh), jnp.float32)),
        interpret=jax.default_backend() == "cpu",
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * n * n * dh,
            bytes_accessed=b * (2 * n * n + 4 * h * n * dh + 4 * h * n) * 4,
            transcendentals=b * h * n * n),
    )(att_self[:, :, None, :], att_neigh[:, :, None, :],
      values, adj_norm, adj_struct, out, g.astype(jnp.float32))
    return (das[:, :, 0, :], dan[:, :, 0, :], dv.astype(values.dtype),
            jnp.zeros_like(adj_norm), jnp.zeros_like(adj_struct))


gat_attention_hm.defvjp(_fwd_hm, _bwd_hm)


def gat_attention(att_self: jax.Array, att_neigh: jax.Array,
                  values: jax.Array, adj_norm: jax.Array,
                  adj_struct: jax.Array, bf16: bool = False,
                  bf16_scores: bool = False) -> jax.Array:
    """Node-major convenience wrapper around :func:`gat_attention_hm`.

    values: [B, N, H, dh]; returns [B, N, H, dh].  The layout
    conversions live OUTSIDE the custom VJP, so autodiff transposes
    each tensor once per direction (fwd: values/out, bwd: g/dv) —
    the VJP itself re-uses the saved head-major residuals instead of
    re-transposing them (the round-2 wrapper paid 6 [B,N,H*dh]-class
    copies per layer step; this pays 4, and the flat fused layer path
    in nn/layers.py pays the same 4 with none elsewhere)."""
    vals_hm = jnp.transpose(values, (0, 2, 1, 3))
    out = gat_attention_hm(att_self, att_neigh, vals_hm, adj_norm,
                           adj_struct, bf16, bf16_scores)
    return jnp.transpose(out, (0, 2, 1, 3))


def gat_attention_reference(att_self, att_neigh, values, adj_norm,
                            adj_struct):
    """Dense XLA chain (the exact nn/layers.py math) for testing.

    Same layouts as ``gat_attention``; returns [B, N, H, dh] f32."""
    a_s = jnp.transpose(att_self, (0, 2, 1))           # [B, N, H]
    a_n = jnp.transpose(att_neigh, (0, 2, 1))
    s = a_s[:, :, None, :] + a_n[:, None, :, :]        # [B, N, N, H]
    struct = adj_struct[..., None] > 0
    s_m = jnp.where(struct, s, -jnp.inf)
    rm = jnp.max(s_m, axis=2, keepdims=True)
    rm = jnp.where(jnp.isfinite(rm), rm, 0.0)
    e = jnp.exp(s_m - rm) * adj_norm[..., None]
    dn = jnp.clip(e.sum(2), 1e-10, None)
    aggr = jnp.einsum("bijh,bjhd->bihd", e,
                      values.astype(jnp.float32)) / dn[..., None]
    return aggr
