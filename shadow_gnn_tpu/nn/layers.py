"""GNN backbone layers over padded dense subgraph blocks (flax.linen).

Numerics match the reference ``shaDow/layers.py`` formulas exactly
(verified per-layer in tests/test_layers.py against numpy ports):

* ``norm_feat``  — per-row layernorm with slice-indexed scale/offset,
  unbiased=False variance + 1e-9 (layers.py:329-338);
* GCN (:417-444)  sym-normalized aggregate -> linear -> act -> norm;
* SAGE (:447-494) rw-normalized neighbor + self linears, separate norm
  slices (norm_dim (2, F)), summed;
* GIN (:497-536)  (1+eps)x + Ax -> 2-layer MLP -> act -> norm;
* GAT (:539-645)  per-head additive attention with the numerically
  stable max-subtracted edge softmax, exp * dropedge-mask, denom
  clamped at 1e-10; self/neigh head-sliced norm; (self+neigh)/2;
* GATScatter (:648-744) the DGL-style variant (attention on source
  features only, residual self connection);
* MLP / SGC / SIGN (:376-414).

Aggregation over a subgraph is a batched matmul ``A @ X`` on [B, N, N]
x [B, N, F] blocks — MXU work — instead of torch.sparse.mm over a
host-built block-diagonal CSR.  Parameters use torch-Linear-style
U(-1/sqrt(fan_in)) init so training dynamics track the reference.
"""
from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import flax.linen as nn


def _fused_attention_flat(att_self, att_neigh, values_flat, adj_norm,
                          adj_struct, heads):
    """Dispatch GAT attention to the fused Pallas kernel, flat layout.

    att_self / att_neigh: [B, N, H];  values_flat: [B, N, H*dh];
    adjacencies: [B, N, N].  Returns the aggregated [B, N, H*dh] f32
    block (denominator division included) — numerics-equal to the dense
    chain (tests/test_pallas_gat.py).  MXU dots run bf16 when either
    the session's matmul precision asks for it or the activations are
    already bf16 (the same trade the XLA path makes).

    The kernel operands/results are head-major ([B, H, N, dh],
    ops/pallas_gat.py:gat_attention_hm); the flat<->head-major
    conversions here are the ONLY [B, N, H*dh]-class layout copies on
    the fused path — one per direction per tensor (fwd values/out,
    bwd g/dv via autodiff of these transposes).
    """
    from shadow_gnn_tpu.ops.pallas_gat import gat_attention_hm
    bf16 = (jax.config.jax_default_matmul_precision
            in ("bfloat16", "tensorfloat32")
            or values_flat.dtype == jnp.bfloat16)
    vals = values_flat if bf16 else values_flat.astype(jnp.float32)
    b, n, d = values_flat.shape
    dh = d // heads
    vals_hm = jnp.transpose(vals.reshape(b, n, heads, dh), (0, 2, 1, 3))
    # under the bf16 precision trade the [N, N] exp/mask score chain
    # also runs bf16 (f32 row-sum denominator) — at papers100M shapes
    # the dots are already fast and the VPU score chain is the cap
    out_hm = gat_attention_hm(
        jnp.transpose(att_self, (0, 2, 1)).astype(jnp.float32),
        jnp.transpose(att_neigh, (0, 2, 1)).astype(jnp.float32),
        vals_hm, adj_norm.astype(jnp.float32),
        adj_struct.astype(jnp.float32), bf16, bf16)
    return jnp.transpose(out_hm, (0, 2, 1, 3)).reshape(b, n, d)


def _head_indicator(heads: int, dh: int) -> jax.Array:
    """[heads*dh, heads] 0/1 block indicator: column h marks head h's
    dh-wide slice of the flat feature axis."""
    return jnp.repeat(jnp.eye(heads, dtype=jnp.float32), dh, axis=0)


def _head_dot(x: jax.Array, g: jax.Array) -> jax.Array:
    """Per-head reduction of the flat feature axis: [..., H*dh] @
    [H*dh, H] -> [..., H], f32 accumulation regardless of the session
    matmul-precision trade (it feeds normalization statistics)."""
    return jax.lax.dot_general(
        x, g, (((x.ndim - 1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)


def torch_linear_init(key, shape, dtype=jnp.float32):
    """U(-1/sqrt(fan_in), 1/sqrt(fan_in)) — torch nn.Linear default."""
    fan_in = shape[0] if len(shape) == 2 else shape[-1]
    bound = 1.0 / jnp.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class TorchLinear(nn.Module):
    """Dense layer with torch's default init (weight [in, out]).

    Parameters stay float32; compute follows the input dtype (bf16
    activations run the matmul on the MXU in bf16 with f32 accumulate).
    """

    features: int
    use_bias: bool = True
    # >0: emit the head-major [..., H, N, features/H] layout straight
    # from the MXU (kernel viewed [f_in, H, dh]) instead of the flat
    # [..., N, features] — same parameters, checkpoint-compatible.
    head_major: int = 0
    # >0: the INPUT is already head-major [..., H_in, N, dh_in] (full
    # cross-layer residency): contract over both the head and dh axes
    # (= the flat feature axis) without materializing the flat layout.
    # Parameters stay the flat [f_in, features] matrix.
    head_major_in: int = 0

    @nn.compact
    def __call__(self, x):
        if self.head_major_in > 0:
            assert self.head_major > 0, "resident input implies hm output"
            hi = self.head_major_in
            h = self.head_major
            f_in = hi * x.shape[-1]
            w = self.param("kernel", torch_linear_init, (f_in, self.features))
            import os as _os
            if _os.environ.get("SHADOW_HM_TRANSFORM", "direct") == "2step":
                # A/B arm: contract dh per input head and reduce h
                # inside the dot, emitting the flat feature axis; the
                # hm repack is a small transpose of the OUTPUT.  Wins
                # the isolated microbench (hm_transform_microbench.py)
                # but LOSES end to end (papers_gat3 26.8 vs 24.1 ms):
                # its output transpose cannot CSE with the kernel-
                # boundary relayouts the direct form shares.
                w3 = w.reshape(hi, x.shape[-1], self.features)
                y = jnp.einsum("...hnd,hdz->...nz", x, w3.astype(x.dtype),
                               preferred_element_type=x.dtype)
                y = y.reshape(y.shape[:-1] + (h, self.features // h))
                y = jnp.swapaxes(y, -3, -2)                 # [..., h, n, dh]
            else:
                w4 = w.reshape(hi, x.shape[-1], h, self.features // h)
                y = jnp.einsum("...hnd,hdke->...kne", x, w4.astype(x.dtype),
                               preferred_element_type=x.dtype)
        elif self.head_major > 0:
            w = self.param("kernel", torch_linear_init,
                           (x.shape[-1], self.features))
            h = self.head_major
            w3 = w.reshape(x.shape[-1], h, self.features // h)
            y = jnp.einsum("...nf,fhd->...hnd", x, w3.astype(x.dtype),
                           preferred_element_type=x.dtype)
        else:
            w = self.param("kernel", torch_linear_init,
                           (x.shape[-1], self.features))
            y = jnp.dot(x, w.astype(x.dtype), preferred_element_type=x.dtype)
        if self.use_bias:
            fan_in = (self.head_major_in * x.shape[-1]
                      if self.head_major_in > 0 else x.shape[-1])

            def bias_init(key, shape, dtype=jnp.float32):
                bound = 1.0 / jnp.sqrt(fan_in)
                return jax.random.uniform(key, shape, dtype, -bound, bound)

            b = self.param("bias", bias_init, (self.features,)).astype(y.dtype)
            if self.head_major > 0:
                b = b.reshape(self.head_major, 1, -1)
            y = y + b
        return y


def get_act(name: str) -> Callable:
    if name == "relu":
        return jax.nn.relu
    if name == "I":
        return lambda x: x          # LeakyReLU(slope=1) == identity
    if name == "elu":
        return jax.nn.elu
    if name == "tanh":
        return jnp.tanh
    if name == "leakyrelu":
        return lambda x: jax.nn.leaky_relu(x, 0.2)
    raise NotImplementedError(f"activation {name}")


class Act(nn.Module):
    """Activation as a module so PReLU can own its parameter
    (reference F_ACT registry, layers.py:26-39; torch PReLU init 0.25).
    'prelu+' uses one slope per output channel."""

    act_name: str
    dim_out: int = 1
    # >0: apply to head-major [..., H, N, dh] activations — the flat
    # per-channel prelu+ slope vector broadcasts as [H, 1, dh]
    # (parameter stays the flat [dim_out], checkpoint-compatible)
    head_major: int = 0

    @nn.compact
    def __call__(self, x):
        if self.act_name in ("prelu", "prelu+"):
            n = self.dim_out if self.act_name == "prelu+" else 1
            a = self.param("prelu_alpha",
                           lambda k, s: jnp.full(s, 0.25, jnp.float32), (n,))
            if self.act_name == "prelu+" and self.head_major > 0:
                a = a.reshape(self.head_major, 1, -1)
            return jnp.where(x > 0, x, a * x)
        return get_act(self.act_name)(x)


@jax.custom_vjp
def norm_feat(feat: jax.Array, scale: jax.Array, offset: jax.Array) -> jax.Array:
    """Reference layers.py:329-338: per-row affine layernorm.

    Statistics accumulate in float32 regardless of activation dtype.
    Custom VJP: the backward reuses the saved [..., 1] row statistics
    (mean / inv-std — negligible memory next to the activations) and
    emits the scale/offset grads from the same fused pass as dx — the
    round-2 flagship trace showed the autodiff norm backward as three
    separate multiply_reduce fusions totalling ~10% of the step."""
    return _norm_feat_fwd_math(feat, scale, offset)[0]


def _norm_feat_fwd_math(feat, scale, offset):
    dt = feat.dtype
    f32 = feat.astype(jnp.float32)
    mean = f32.mean(-1, keepdims=True)
    var = ((f32 - mean) ** 2).mean(-1, keepdims=True) + 1e-9
    inv = jax.lax.rsqrt(var)
    out = (f32 - mean) * scale * inv + offset
    return out.astype(dt), (mean, inv)


def _norm_feat_fwd(feat, scale, offset):
    out, (mean, inv) = _norm_feat_fwd_math(feat, scale, offset)
    # mean/inv are [..., 1] — cheap residuals that spare the backward a
    # full recompute pass over the activations
    return out, (feat, scale, mean, inv)


def _reduce_to(x: jax.Array, shape) -> jax.Array:
    """Sum ``x`` down to a broadcast-compatible ``shape`` (leading axes
    plus any size-1 broadcast axes, e.g. the head-major [h, 1, dh]
    scale layout)."""
    red = tuple(range(x.ndim - len(shape)))
    x = x.sum(red)
    axes = tuple(i for i, s in enumerate(shape) if s == 1 and x.shape[i] != 1)
    if axes:
        x = x.sum(axes, keepdims=True)
    return x.reshape(shape)


def _norm_feat_bwd(res, g):
    feat, scale, mean, inv = res
    f32 = feat.astype(jnp.float32)
    g32 = g.astype(jnp.float32)
    xhat = (f32 - mean) * inv
    dscale = _reduce_to(g32 * xhat, scale.shape)
    doffset = _reduce_to(g32, scale.shape)
    gs = g32 * scale
    dx = inv * (gs - gs.mean(-1, keepdims=True)
                - xhat * (gs * xhat).mean(-1, keepdims=True))
    return dx.astype(feat.dtype), dscale, doffset


norm_feat.defvjp(_norm_feat_fwd, _norm_feat_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def norm_feat_grouped(feat: jax.Array, scale: jax.Array, offset: jax.Array,
                      heads: int) -> jax.Array:
    """Per-head ``norm_feat`` on FLAT [..., H*dh] activations.

    Numerically equals ``norm_feat(feat.reshape(..., H, dh), scale_4d,
    offset_4d).reshape(..., H*dh)`` with ``scale = scale_4d.ravel()``
    (tested in tests/test_layers.py), but never materializes the
    [..., H, dh] layout: per-head mean/var reduce through a tiny
    [H*dh, H] indicator matmul and broadcast back through its
    transpose.  On TPU a reshape that splits the lane axis into a
    non-lane-aligned head dim (e.g. papers100M dh=200) is a physical
    repack of the whole activation tensor — the round-2 GAT trace
    showed those copies at 25% of the epoch; this keeps the entire
    layer flat."""
    return _norm_grouped_fwd_math(feat, scale, offset, heads)[0]


def _norm_grouped_fwd_math(feat, scale, offset, heads):
    dt = feat.dtype
    f32 = feat.astype(jnp.float32)
    dh = f32.shape[-1] // heads
    g = _head_indicator(heads, dh)
    mean_h = _head_dot(f32, g) / dh                    # [..., H]
    mean = _head_dot(mean_h, g.T)                      # broadcast [..., H*dh]
    cent = f32 - mean
    var_h = _head_dot(cent * cent, g) / dh + 1e-9
    inv_h = jax.lax.rsqrt(var_h)
    inv = _head_dot(inv_h, g.T)
    out = cent * scale * inv + offset
    return out.astype(dt), (mean_h, inv_h)


def _norm_grouped_fwd(feat, scale, offset, heads):
    out, (mean_h, inv_h) = _norm_grouped_fwd_math(feat, scale, offset, heads)
    # per-head [..., H] statistics — cheap residuals (the broadcast
    # [..., H*dh] versions are two tiny matmuls away in the backward)
    return out, (feat, scale, mean_h, inv_h)


def _norm_grouped_bwd(heads, res, g_out):
    feat, scale, mean_h, inv_h = res
    f32 = feat.astype(jnp.float32)
    g32 = g_out.astype(jnp.float32)
    dh = f32.shape[-1] // heads
    g = _head_indicator(heads, dh)
    xhat = (f32 - _head_dot(mean_h, g.T)) * _head_dot(inv_h, g.T)
    red = tuple(range(g32.ndim - 1))
    dscale = (g32 * xhat).sum(red).reshape(scale.shape)
    doffset = g32.sum(red).reshape(scale.shape)
    gs = g32 * scale
    gs_mean = _head_dot(_head_dot(gs, g) / dh, g.T)
    gsx_mean = _head_dot(_head_dot(gs * xhat, g) / dh, g.T)
    dx = _head_dot(inv_h, g.T) * (gs - gs_mean - xhat * gsx_mean)
    return dx.astype(feat.dtype), dscale, doffset


norm_feat_grouped.defvjp(_norm_grouped_fwd, _norm_grouped_bwd)


def pairnorm(feat: jax.Array, node_mask: jax.Array, s: float = 1.0) -> jax.Array:
    """PairNorm-SI per subgraph block.

    The reference's pairnorm (layers.py:340-361) is unfinished (live
    breakpoint, missing 1/|V| factor); this is the corrected
    scale-individual variant: center per subgraph, then L2-normalize
    each row (zero rows pass through, like the idx_null guard :356-357).
    """
    m = node_mask[..., None].astype(feat.dtype)
    cnt = jnp.clip(m.sum(-2, keepdims=True), 1.0, None)
    mean = (feat * m).sum(-2, keepdims=True) / cnt
    centered = (feat - mean) * m
    null = (jnp.abs(centered).sum(-1, keepdims=True) == 0)
    centered = jnp.where(null, feat, centered)
    norm = jnp.sqrt((centered ** 2).sum(-1, keepdims=True) + 1e-12)
    return s * centered / norm * m


def pairnorm_hm(feat: jax.Array, node_mask: jax.Array,
                s: float = 1.0) -> jax.Array:
    """:func:`pairnorm` on head-major [B, H, N, dh] activations without
    materializing the flat layout: the per-feature centering runs over
    the node axis (2) and the per-node L2 norm reduces over BOTH the
    head and dh axes (= the flat feature axis).  Numerically equal to
    ``pairnorm(flat)`` reshaped (tests/test_layers.py)."""
    m = node_mask[:, None, :, None].astype(feat.dtype)      # [B,1,N,1]
    cnt = jnp.clip(m.sum(2, keepdims=True), 1.0, None)
    mean = (feat * m).sum(2, keepdims=True) / cnt
    centered = (feat - mean) * m
    null = (jnp.abs(centered).sum((1, 3), keepdims=True) == 0)
    centered = jnp.where(null, feat, centered)
    norm = jnp.sqrt((centered ** 2).sum((1, 3), keepdims=True) + 1e-12)
    return s * centered / norm * m


class _ConvBase(nn.Module):
    """Shared config for conv layers."""

    dim_out: int
    dropout: float = 0.0
    act: str = "relu"
    norm: str = "norm_feat"
    mulhead: int = 1
    # GAT only: fused Pallas masked-attention kernel (ops/pallas_gat.py)
    # instead of the dense [B,N,N,H] score chain
    fused_att: bool = False
    # GAT only: full cross-layer head-major residency — the layer
    # consumes AND emits [b, h, n, dh]; the model keeps the JK list
    # head-major and ResPool converts once (round-5, VERDICT r4 #4)
    hm_chain: bool = False

    def _norm_params(self, shape):
        scale = self.param("scale", nn.initializers.ones, shape)
        offset = self.param("offset", nn.initializers.zeros, shape)
        return scale, offset

    def _maybe_norm(self, feat, scale, offset, node_mask=None):
        if self.norm == "none":
            return feat
        if self.norm == "pairnorm":
            assert node_mask is not None
            return pairnorm(feat, node_mask)
        return norm_feat(feat, scale, offset)

    def _dropout(self, x, train):
        if self.dropout <= 0.0:
            return x
        if x.ndim == 4 and train:
            # head-major activations: draw the mask bits FLAT and
            # bitcast-reshape.  RngBitGenerator picks its own layout
            # for 4-D shapes ({2,3,1,0} at the papers shape) and XLA
            # then relayouts the bits to the consumer's — two
            # [b,h,n,dh]-sized u32 copies per layer (~41 ms/epoch at
            # papers_gat3).  A 1-D draw is layout-free.
            rng = self.make_rng("dropout")
            keep = jax.random.bernoulli(
                rng, 1.0 - self.dropout, (x.size,)).reshape(x.shape)
            return jnp.where(keep, x / (1.0 - self.dropout), 0.0)
        return nn.Dropout(self.dropout, deterministic=not train)(x)


class GCNConv(_ConvBase):
    @nn.compact
    def __call__(self, feat, adj_norm, adj_struct, node_mask, *, train: bool):
        f = Act(self.act, dim_out=self.dim_out)
        x = self._dropout(feat, train)
        aggr = adj_norm(x) if callable(adj_norm) else jnp.einsum(
            "bij,bjf->bif", adj_norm, x)
        out = f(TorchLinear(self.dim_out)(aggr))
        scale, offset = self._norm_params((self.dim_out,))
        return self._maybe_norm(out, scale, offset, node_mask)


class SAGEConv(_ConvBase):
    @nn.compact
    def __call__(self, feat, adj_norm, adj_struct, node_mask, *, train: bool):
        f = Act(self.act, dim_out=self.dim_out)
        x = self._dropout(feat, train)
        h_self = f(TorchLinear(self.dim_out, use_bias=True)(x))
        neigh = adj_norm(x) if callable(adj_norm) else jnp.einsum(
            "bij,bjf->bif", adj_norm, x)
        h_neigh = f(TorchLinear(self.dim_out, use_bias=True)(neigh))
        scale, offset = self._norm_params((2, self.dim_out))
        h_self = self._maybe_norm(h_self, scale[0], offset[0], node_mask)
        h_neigh = self._maybe_norm(h_neigh, scale[1], offset[1], node_mask)
        return h_self + h_neigh


class GINConv(_ConvBase):
    @nn.compact
    def __call__(self, feat, adj_norm, adj_struct, node_mask, *, train: bool):
        f = Act(self.act, dim_out=self.dim_out)
        x = self._dropout(feat, train)
        eps = self.param("eps", nn.initializers.zeros, (1,))
        neigh = adj_norm(x) if callable(adj_norm) else jnp.einsum(
            "bij,bjf->bif", adj_norm, x)
        aggr = neigh + (1.0 + eps) * x
        h = TorchLinear(self.dim_out)(aggr)
        h = TorchLinear(self.dim_out)(jax.nn.relu(h))
        out = f(h)
        scale, offset = self._norm_params((self.dim_out,))
        return self._maybe_norm(out, scale, offset, node_mask)


class GATConv(_ConvBase):
    """Reference GAT (layers.py:539-645) over dense blocks.

    Attention on subgraph blocks IS masked dense attention: scores
    S[b,i,j] = leaky(a_s . h_i) + leaky(a_n . h_j), softmax over the
    structural edges of row i with dropedge-zeroed exp terms.
    """

    @nn.compact
    def __call__(self, feat, adj_norm, adj_struct, node_mask, *, train: bool):
        h = self.mulhead
        dh = self.dim_out // h
        assert self.dim_out % h == 0
        import os as _os
        # Measured at the products/papers leaderboard shapes (BENCH.md
        # round 4, ms/step): headmajor 19.01/25.74 < hybrid 22.23/31.72
        # < flat 25.02/35.71.  'headmajor' keeps every activation in
        # the kernel's native [b, h, n, dh] layout from the transform
        # einsum to the output combine; with ``hm_chain`` (round 5) the
        # residency extends ACROSS layers — the layer consumes and
        # emits [b, h, n, dh], pairnorm/prelu+ run head-major
        # (pairnorm_hm / Act.head_major), and the single flat
        # conversion happens at ResPool.  'hybrid' (4-D scores/norm +
        # head-major kernel) and 'flat' stay as A/B arms.
        _layout = _os.environ.get("SHADOW_GAT_LAYOUT", "headmajor")
        use_hm = self.fused_att and _layout == "headmajor"
        if not self.hm_chain:
            # standalone (non-resident) call keeps the round-4 criterion:
            # pairnorm / per-channel prelu fall back to the hybrid path
            use_hm = (use_hm and self.act != "prelu+"
                      and self.norm != "pairnorm")
        f = Act(self.act, dim_out=self.dim_out,
                head_major=h if use_hm else 0)
        x = self._dropout(feat, train)
        hm_in = x.ndim == 4                    # resident [b, h, n, dh] input
        assert not hm_in or (use_hm and self.hm_chain)
        if hm_in:
            b, _, n, _ = x.shape
        else:
            b, n, _ = x.shape
        h_self_f = f(TorchLinear(self.dim_out,
                                 head_major=h if use_hm else 0,
                                 head_major_in=h if hm_in else 0)(x))
        h_neigh_f = f(TorchLinear(self.dim_out,
                                  head_major=h if use_hm else 0,
                                  head_major_in=h if hm_in else 0)(x))
        # attention params: [2, heads, dh] xavier-uniform (layers.py:557-558)
        att = self.param("attention", nn.initializers.glorot_uniform(),
                         (2, h, dh))
        scale, offset = self._norm_params((2, h, dh))
        if use_hm:
            # h_self_f/h_neigh_f are [b, h, n, dh] here
            from shadow_gnn_tpu.ops.pallas_gat import gat_attention_hm
            att_self = jax.nn.leaky_relu(
                jnp.einsum("bhnd,hd->bhn", h_self_f, att[0]), 0.2)
            att_neigh = jax.nn.leaky_relu(
                jnp.einsum("bhnd,hd->bhn", h_neigh_f, att[1]), 0.2)
            bf16 = (jax.config.jax_default_matmul_precision
                    in ("bfloat16", "tensorfloat32")
                    or h_neigh_f.dtype == jnp.bfloat16)
            vals = h_neigh_f if bf16 else h_neigh_f.astype(jnp.float32)
            aggr = gat_attention_hm(
                att_self.astype(jnp.float32), att_neigh.astype(jnp.float32),
                vals, adj_norm.astype(jnp.float32),
                adj_struct.astype(jnp.float32), bf16, bf16).astype(x.dtype)
            h_self_hm = h_self_f
            if self.norm == "pairnorm":
                aggr = pairnorm_hm(aggr, node_mask)
                h_self_hm = pairnorm_hm(h_self_hm, node_mask)
            elif self.norm != "none":
                aggr = norm_feat(aggr, scale[0][:, None, :],
                                 offset[0][:, None, :])
                h_self_hm = norm_feat(h_self_hm, scale[1][:, None, :],
                                      offset[1][:, None, :])
            out = (h_self_hm + aggr) / 2.0
            if self.hm_chain:
                return out
            return jnp.transpose(out, (0, 2, 1, 3)).reshape(b, n, -1)
        if self.fused_att and _layout in ("hybrid", "headmajor"):
            # hybrid: 4-D scores/norm like the dense branch, head-major
            # kernel via the node-major wrapper.  Also the fallback when
            # a requested headmajor could not apply (pairnorm / prelu+).
            from shadow_gnn_tpu.ops.pallas_gat import gat_attention
            h_self = h_self_f.reshape(b, n, h, dh)
            h_neigh = h_neigh_f.reshape(b, n, h, dh)
            att_self = jax.nn.leaky_relu(
                jnp.einsum("bnhd,hd->bnh", h_self, att[0]), 0.2)
            att_neigh = jax.nn.leaky_relu(
                jnp.einsum("bnhd,hd->bnh", h_neigh, att[1]), 0.2)
            bf16 = (jax.config.jax_default_matmul_precision
                    in ("bfloat16", "tensorfloat32")
                    or h_neigh.dtype == jnp.bfloat16)
            vals = h_neigh if bf16 else h_neigh.astype(jnp.float32)
            aggr = gat_attention(
                jnp.transpose(att_self, (0, 2, 1)).astype(jnp.float32),
                jnp.transpose(att_neigh, (0, 2, 1)).astype(jnp.float32),
                vals, adj_norm.astype(jnp.float32),
                adj_struct.astype(jnp.float32), bf16, bf16).astype(x.dtype)
            if self.norm == "pairnorm":
                aggr = pairnorm(aggr.reshape(b, n, -1), node_mask).reshape(
                    b, n, h, dh)
                h_self = pairnorm(h_self.reshape(b, n, -1),
                                  node_mask).reshape(b, n, h, dh)
            elif self.norm != "none":
                aggr = norm_feat(aggr, scale[0], offset[0])
                h_self = norm_feat(h_self, scale[1], offset[1])
            return (h_self.reshape(b, n, -1) + aggr.reshape(b, n, -1)) / 2.0
        if self.fused_att:
            # flat path: activations stay [b, n, h*dh] end to end —
            # per-head scores and norms reduce through the [h*dh, h]
            # indicator matmul (_head_dot); the only head-major
            # materialization is the kernel's value/out conversion
            # (_fused_attention_flat).  Equal to the dense branch
            # within summation-order tolerance (tests/test_layers.py).
            att_self = jax.nn.leaky_relu(
                _head_dot(h_self_f * att[0].reshape(-1), _head_indicator(
                    h, dh)), 0.2)
            att_neigh = jax.nn.leaky_relu(
                _head_dot(h_neigh_f * att[1].reshape(-1), _head_indicator(
                    h, dh)), 0.2)
            aggr = _fused_attention_flat(att_self, att_neigh, h_neigh_f,
                                         adj_norm, adj_struct,
                                         h).astype(x.dtype)
            if self.norm == "pairnorm":
                aggr = pairnorm(aggr, node_mask)
                h_self_f = pairnorm(h_self_f, node_mask)
            elif self.norm != "none":
                aggr = norm_feat_grouped(aggr, scale[0].reshape(-1),
                                         offset[0].reshape(-1), h)
                h_self_f = norm_feat_grouped(h_self_f, scale[1].reshape(-1),
                                             offset[1].reshape(-1), h)
            return (h_self_f + aggr) / 2.0
        h_self = h_self_f.reshape(b, n, h, dh)
        h_neigh = h_neigh_f.reshape(b, n, h, dh)
        att_self = jax.nn.leaky_relu(
            jnp.einsum("bnhd,hd->bnh", h_self, att[0]), 0.2)
        att_neigh = jax.nn.leaky_relu(
            jnp.einsum("bnhd,hd->bnh", h_neigh, att[1]), 0.2)
        # S[b,i,j,h] over structural edges
        s = att_self[:, :, None, :] + att_neigh[:, None, :, :]
        struct = adj_struct[..., None] > 0
        s_masked = jnp.where(struct, s, -jnp.inf)
        row_max = jnp.max(s_masked, axis=2, keepdims=True)  # [b,i,1,h]
        row_max = jnp.where(jnp.isfinite(row_max), row_max, 0.0)
        # exponentiate the MASKED scores: exp(-inf)=0 keeps non-edges
        # exactly zero even when an off-edge score exceeds row_max
        # (unmasked exp could overflow to inf and yield inf*0 = NaN)
        e = jnp.exp(s_masked - row_max) * adj_norm[..., None]
        denom = jnp.clip(e.sum(2), 1e-10, None)             # [b,i,h]
        aggr = jnp.einsum("bijh,bjhd->bihd", e,
                          h_neigh) / denom[..., None]
        if self.norm == "pairnorm":
            aggr = pairnorm(aggr.reshape(b, n, -1), node_mask).reshape(
                b, n, h, dh)
            h_self = pairnorm(h_self.reshape(b, n, -1), node_mask).reshape(
                b, n, h, dh)
        elif self.norm != "none":
            aggr = norm_feat(aggr, scale[0], offset[0])
            h_self = norm_feat(h_self, scale[1], offset[1])
        out = (h_self.reshape(b, n, -1) + aggr.reshape(b, n, -1)) / 2.0
        return out


class GATScatterConv(_ConvBase):
    """DGL-style GAT variant (layers.py:648-744)."""

    @nn.compact
    def __call__(self, feat, adj_norm, adj_struct, node_mask, *, train: bool):
        f = Act(self.act, dim_out=self.dim_out)
        h = self.mulhead
        dh = self.dim_out // h
        x = self._dropout(feat, train)
        b, n, _ = x.shape
        gain = jnp.sqrt(2.0) if self.act == "relu" else 1.0

        def xavier_normal_gain(key, shape, dtype=jnp.float32):
            fan_in, fan_out = shape[0], shape[-1]
            std = gain * jnp.sqrt(2.0 / (fan_in + fan_out))
            return std * jax.random.normal(key, shape, dtype)

        w_src = self.param("w_src", xavier_normal_gain, (x.shape[-1], self.dim_out))
        b_src = self.param("b_src", nn.initializers.zeros, (self.dim_out,))
        w_dst = self.param("w_dst", xavier_normal_gain, (x.shape[-1], self.dim_out))
        b_dst = self.param("b_dst", nn.initializers.zeros, (self.dim_out,))
        att = self.param("attention", xavier_normal_gain, (1, h, dh))
        if self.fused_att:
            # flat path (see GATConv): score of edge (i, j) depends only
            # on source j, so att_self = 0
            feat_src_f = x @ w_src + b_src                  # [b, n, h*dh]
            el = jax.nn.leaky_relu(
                _head_dot(feat_src_f * att.reshape(-1),
                          _head_indicator(h, dh)), 0.2)
            aggr_f = _fused_attention_flat(
                jnp.zeros_like(el), el, feat_src_f, adj_norm, adj_struct,
                h).astype(x.dtype)
            feat_self = x @ w_dst + b_dst
            out = f(aggr_f + feat_self)
            scale, offset = self._norm_params((self.dim_out,))
            return self._maybe_norm(out, scale, offset, node_mask)
        feat_src = (x @ w_src + b_src).reshape(b, n, h, dh)
        el = jax.nn.leaky_relu(jnp.einsum("bnhd,ohd->bnh", feat_src, att), 0.2)
        # (reference :727-729)
        s = jnp.broadcast_to(el[:, None, :, :], (b, n, n, h))
        struct = adj_struct[..., None] > 0
        s_masked = jnp.where(struct, s, -jnp.inf)
        row_max = jnp.max(s_masked, axis=2, keepdims=True)
        row_max = jnp.where(jnp.isfinite(row_max), row_max, 0.0)
        e = jnp.exp(s_masked - row_max) * adj_norm[..., None]
        denom = jnp.clip(e.sum(2), 1e-10, None)
        aggr = jnp.einsum("bijh,bjhd->bihd", e,
                          feat_src) / denom[..., None]
        feat_self = x @ w_dst + b_dst
        out = f(aggr.reshape(b, n, -1) + feat_self)
        scale, offset = self._norm_params((self.dim_out,))
        return self._maybe_norm(out, scale, offset, node_mask)


class MLPLayer(_ConvBase):
    """MLP / SGC / SIGN layer (layers.py:376-414): ignores the adjacency."""

    @nn.compact
    def __call__(self, feat, adj_norm=None, adj_struct=None, node_mask=None,
                 *, train: bool):
        f = Act(self.act, dim_out=self.dim_out)
        x = self._dropout(feat, train)
        out = f(TorchLinear(self.dim_out)(x))
        scale, offset = self._norm_params((self.dim_out,))
        return self._maybe_norm(out, scale, offset, node_mask)


NAME2LAYER = {
    "mlp": MLPLayer,
    "gcn": GCNConv,
    "gin": GINConv,
    "sage": SAGEConv,
    "gat": GATConv,
    "gatscat": GATScatterConv,
    "sgc": MLPLayer,
    "sign": MLPLayer,
}
