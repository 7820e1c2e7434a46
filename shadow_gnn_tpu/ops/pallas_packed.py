"""Pallas TPU kernel: fused bit-unpack + normalize + aggregate.

The subgraph cache stores adjacency bit-packed (sampling/cache.py);
the XLA path unpacks to a [B, N, N] f32 block in HBM, normalizes it
(ops/normalize.py), and feeds batched matmuls.  This kernel fuses the
whole chain per subgraph block inside VMEM:

    out[b] = norm(unpack(bits[b]), dropedge) @ x[b]

* bits stay 8x smaller in HBM; the dense adjacency never round-trips;
* unpack uses the lane-tiled repeat trick (see _unpack_block) — all
  2D [N, N] VPU ops, no gathers;
* row/sym normalization and Bernoulli dropedge (pltpu PRNG, identical
  mask regenerated from the same seed in the backward pass) happen
  in-register before one MXU dot per block;
* custom VJP: dx[b] = norm(unpack(bits[b]))^T @ g[b] via the same
  kernel with a transposed contraction.

Semantics match ops/normalize.py: rw = D_drop^-1 A_drop,
sym = D^-1/2 (M*M^T applied) D^-1/2, gin = (deg/deg_drop) row rescale,
none = raw 0/1 (GAT handles its own softmax on the structural block).

Measured on one v5e chip (SAGE-3, N=208, F=256, B=64): elementwise-
equal outputs; ~1.6ms/call vs ~1.6ms for the XLA unpack+norm+einsum
chain — at this block size XLA's fusion already keeps the adjacency
chain off the critical path, so the kernel is an OPT-IN
(--packed_adj / ModelConfig.packed_adj) aimed at the larger
k=400/dim=800 papers100M-class blocks where the dense adjacency
round-trip is 4x bigger.
"""
from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NORMS = ("none", "rw", "sym", "gin")


def _unpack_block(bits_i32, n: int):
    """[N, BYTES] int32 -> [N, n] f32 in-VMEM unpack (tiled layout).

    pltpu.repeat tiles the byte row 8x: element (i, j) = bits[i, j % B];
    with the tiled packing (bit s of byte b = column s*B+b) the shift
    for column j is simply j // B."""
    nbytes = bits_i32.shape[-1]
    rep = pltpu.repeat(bits_i32, 8, axis=1)          # (i, j) = bits[i, j % B]
    col = jax.lax.broadcasted_iota(jnp.int32, rep.shape, 1)
    adj = jnp.right_shift(rep, col // nbytes) & 1
    return adj[:, :n].astype(jnp.float32)


def _norm_adj(adj, norm: str, dropedge: float, seed, b_idx):
    if dropedge > 0.0:
        pltpu.prng_seed(seed + b_idx)
        rbits = pltpu.prng_random_bits(adj.shape)
        keep = (rbits.astype(jnp.uint32) >
                jnp.uint32(int(dropedge * (2**32 - 1)))).astype(jnp.float32)
        if norm == "sym":
            s = adj * keep
            adj_d = s * s.T                      # symmetric survival
        else:
            adj_d = adj * keep
    else:
        adj_d = adj
    if norm == "rw":
        deg = jnp.clip(adj_d.sum(1, keepdims=True), 1.0, None)
        return adj_d / deg
    if norm == "sym":
        deg = jnp.clip(adj_d.sum(1, keepdims=True), 1.0, None)
        r = jax.lax.rsqrt(deg)
        return adj_d * r * r.T
    if norm == "gin":
        deg0 = adj.sum(1, keepdims=True)
        degd = jnp.clip(adj_d.sum(1, keepdims=True), 1.0, None)
        return adj_d * (deg0 / degd)
    return adj_d


def _kernel(seed_ref, bits_ref, x_ref, out_ref, *, n, norm, dropedge,
            transpose, bf16):
    b_idx = pl.program_id(0)
    bits = bits_ref[0].astype(jnp.int32)
    adj = _unpack_block(bits, n)
    adj = _norm_adj(adj, norm, dropedge, seed_ref[0], b_idx)
    x = x_ref[0]
    if bf16:
        # single-pass bf16 MXU dot (the same trade as XLA's DEFAULT
        # precision for f32 matmuls); f32 accumulate
        adj = adj.astype(jnp.bfloat16)
        x = x.astype(jnp.bfloat16)
    if transpose:
        out = jax.lax.dot_general(adj, x, (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
    else:
        out = jnp.dot(adj, x, preferred_element_type=jnp.float32)
    out_ref[0] = out


def _call(bits, x, n, norm, dropedge, seed, transpose, bf16=False):
    """seed is a traced int32 scalar array."""
    b, _, nbytes = bits.shape
    f = x.shape[-1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n, nbytes), lambda i, s: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, f), lambda i, s: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n, f), lambda i, s: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    kernel = functools.partial(_kernel, n=n, norm=norm, dropedge=dropedge,
                               transpose=transpose, bf16=bf16)
    seed_arr = jnp.reshape(jnp.asarray(seed, jnp.int32), (1,))
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        interpret=jax.default_backend() == "cpu",
        out_shape=jax.ShapeDtypeStruct((b, n, f), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * n * f,
            bytes_accessed=b * (n * nbytes + 2 * n * f * 4),
            transcendentals=0),
    )(seed_arr, bits, x)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def packed_spmm(bits: jax.Array, x: jax.Array, seed=0,
                norm: str = "none", dropedge: float = 0.0,
                bf16: bool = False) -> jax.Array:
    """out[b] = norm(unpack(bits[b])) @ x[b].

    bits [B, N, ceil(N/8)] uint8, x [B, N, F] f32, seed int32 scalar
    (traced; the same dropedge mask is regenerated in the backward
    pass) -> [B, N, F] f32.  Differentiable in x.  bf16=True runs the
    MXU dot in single-pass bf16 with f32 accumulate.
    """
    assert norm in _NORMS
    return _call(bits, x, x.shape[1], norm, dropedge, seed, False, bf16)


def _fwd(bits, x, seed, norm, dropedge, bf16):
    return packed_spmm(bits, x, seed, norm, dropedge, bf16), (bits, seed)


def _bwd(norm, dropedge, bf16, res, g):
    bits, seed = res
    dx = _call(bits, g, g.shape[1], norm, dropedge, seed, True, bf16)
    return None, dx, None


packed_spmm.defvjp(_fwd, _bwd)


def packed_spmm_reference(bits, x, norm="none", dropedge=0.0, seed=0):
    """XLA reference implementation (no dropedge) for testing."""
    from shadow_gnn_tpu.sampling.cache import unpack_bits
    from shadow_gnn_tpu.ops.normalize import adj_norm_rw, adj_norm_sym
    adj = unpack_bits(bits, x.shape[1])
    assert dropedge == 0.0
    if norm == "rw":
        adj = adj_norm_rw(adj)
    elif norm == "sym":
        adj = adj_norm_sym(adj)
    elif norm == "gin":
        pass
    return jnp.einsum("bij,bjf->bif", adj, x)
