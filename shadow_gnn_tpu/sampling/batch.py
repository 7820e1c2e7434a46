"""Static-shape subgraph batch containers + entity encodings.

Where the reference collates variable-size per-root subgraphs into one
host-side block-diagonal scipy CSR per batch (``graph.py:280-320``,
``minibatch.py:42-66``), this framework keeps each root's subgraph as a
fixed-capacity padded block: a batch is ``[B, N]`` node tables and
``[B, N, N]`` dense adjacency blocks.  Mutual isolation of per-target
subgraphs (the core shaDow property) holds by construction, and every
GNN aggregation becomes a batched matmul on the MXU.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class SubgraphBatch(NamedTuple):
    """One batch of B padded subgraphs (a JAX pytree).

    nodes      [B, N] int32  global node ids, sorted ascending; padding
                             slots hold ``num_nodes`` (sorts last)
    node_mask  [B, N] bool
    adj        [B, N, N] f32 induced adjacency (1.0 per edge; row = out-
                             neighborhood like CSR rows in the reference)
    targets    [B, T] int32  local indices of target nodes (T=1 node task,
                             T=2 link task)
    size       [B] int32     number of valid nodes per subgraph
    hop        [B, N] int32  BFS hop from target (-1 = unreachable/padding)
    ppr        [B, N] f32    PPR score annotations (0 when absent)
    drnl       [B, N] int32  DRNL labels (link task; 0 otherwise)
    """

    nodes: jax.Array
    node_mask: jax.Array
    adj: jax.Array
    targets: jax.Array
    size: jax.Array
    hop: jax.Array
    ppr: jax.Array
    drnl: jax.Array
    overflow: jax.Array = jnp.zeros((), jnp.int32)
    # bit-packed adjacency (present on cached batches; enables the
    # fused Pallas aggregation path, ops/pallas_packed.py)
    adj_bits: Optional[jax.Array] = None

    @property
    def batch_size(self):
        return self.nodes.shape[0]

    @property
    def n_pad(self):
        return self.nodes.shape[1]


@dataclasses.dataclass(frozen=True)
class SamplerConfig:
    """Static sampler configuration (hashable -> usable as jit static arg).

    Mirrors the per-branch sampler dicts of the reference yml
    (``minibatch.py:344-400``) with the additional static padding caps a
    TPU program needs.
    """

    method: str                     # nodeIID | khop | ppr | ppr_st
    n_pad: int                      # subgraph node capacity (static)
    num_targets: int = 1            # 1 = node task, 2 = link task
    # khop
    depth: int = 2
    budget: int = 20
    # ppr / ppr_st
    k: int = 200
    alpha: float = 0.85
    epsilon: float = 1e-5
    threshold: float = 0.0
    # induction flags
    add_self_edge: bool = False
    include_target_conn: bool = False
    # induction strategy:
    #  'rows'   — per-member contiguous neighbor-row slice gather
    #             ([B, N, deg_cap]) + fused compare-reduce membership;
    #             the default (TPU element gathers measured ~100ns/elt
    #             made the candidate strategies 50% of cold epochs).
    #             deg_cap must cover every non-hub member's degree;
    #             hub_slots > 0 routes over-degree members through the
    #             static hub table (undirected only).
    #  'cand'   — candidate-edge element gather, work ~ sum(deg),
    #             needs cand_cap > 0 (directed hub-heavy fallback)
    #  'hub'    — degree-capped candidates + hub table (round-2 path)
    #  'search' — pairwise binary search, exact for any cap
    # cand_cap is the static per-subgraph candidate budget of
    # cand/hub; deg_cap/hub_slots parameterize 'rows' and 'hub'.
    induction: str = "search"
    cand_cap: int = 0
    deg_cap: int = 0
    hub_slots: int = 0
    # feature augmentation to compute ('hops'/'pprs'/'drnls')
    aug_feats: Tuple[str, ...] = ()

    def __post_init__(self):
        assert self.method in ("nodeIID", "khop", "ppr", "ppr_st", "full")

    @property
    def is_stochastic(self) -> bool:
        # matches CONFIG_TEMPLATE.yml algorithm.sampler.deterministic: [ppr]
        return self.method in ("khop", "ppr_st")


def default_n_pad(cfg_dict: dict, num_targets: int = 1, round_to: int = 8) -> int:
    """Capacity bound for a sampler config.

    ppr: each target contributes <= k table entries (+ itself);
    khop: level caps multiply by budget (reference khop frontier growth).
    """
    m = cfg_dict["method"]
    if m in ("ppr", "ppr_st"):
        cap = num_targets * (int(cfg_dict["k"]) + 1)
    elif m == "khop":
        cap, lvl = num_targets, num_targets
        for _ in range(int(cfg_dict["depth"])):
            lvl = lvl * int(cfg_dict["budget"])
            cap += lvl
    elif m == "nodeIID":
        cap = num_targets
    else:
        raise ValueError(m)
    return int(-(-cap // round_to) * round_to)


# ---------------------------------------------------------------------------
# entity encodings: one-hot feature augmentations (reference graph.py:134-172)
# ---------------------------------------------------------------------------

DIM_1HOT_HOP = 7      # unreachable + self + hops 1..5 (minibatch.py:246)
DIM_1HOT_PPR = 1      # (minibatch.py:247)
DIM_1HOT_DRNL = 26    # unreachable + drnl 1..25 (minibatch.py:248)


def hop2onehot(hop: jax.Array, dim: int = DIM_1HOT_HOP) -> jax.Array:
    """[..., N] int -> [..., N, dim] one-hot.

    col 0 = unreachable (hop<0 or >=255); col h+1 for h in 0..dim-2;
    hops in [dim-1, 254] intentionally produce an all-zero row, exactly
    like the reference's hop2onehot_vec (graph.py:134-147).
    """
    unreach = (hop < 0) | (hop >= 255)
    cols = jnp.where(unreach, 0, hop + 1)
    valid = unreach | (hop <= dim - 2)
    oh = jax.nn.one_hot(cols, dim, dtype=jnp.float32)
    return oh * valid[..., None]


def ppr2onehot(ppr: jax.Array, dim: int = DIM_1HOT_PPR) -> jax.Array:
    """Bucket by powers of 0.25 (reference graph.py:149-158).

    With dim=1 this is 1 iff 0 <= ppr <= 1 (i.e. ~always for real scores).
    """
    uppers = jnp.asarray([0.25 ** i for i in range(dim)], dtype=jnp.float32)
    lowers = jnp.asarray([0.25 ** (i + 1) for i in range(dim - 1)] + [0.0],
                         dtype=jnp.float32)
    p = ppr[..., None]
    return ((p <= uppers) & (p >= lowers)).astype(jnp.float32)


def drnl2onehot(drnl: jax.Array, dim: int = DIM_1HOT_DRNL) -> jax.Array:
    """One-hot of drnl with idx 0 = unreachable/overflow (graph.py:160-172)."""
    d = jnp.where((drnl >= 255) | (drnl > dim - 1) | (drnl < 0), 0, drnl)
    return jax.nn.one_hot(d, dim, dtype=jnp.float32)


AUG2DIM = {"hops": DIM_1HOT_HOP, "pprs": DIM_1HOT_PPR, "drnls": DIM_1HOT_DRNL}


def batch_aug_onehots(batch: SubgraphBatch, aug_feats) -> dict:
    """Compute requested one-hot augmentations for a batch, masked."""
    out = {}
    m = batch.node_mask[..., None]
    if "hops" in aug_feats:
        out["hops"] = hop2onehot(batch.hop) * m
    if "pprs" in aug_feats:
        out["pprs"] = ppr2onehot(batch.ppr) * m
    if "drnls" in aug_feats:
        out["drnls"] = drnl2onehot(batch.drnl) * m
    return out


def sort_dedup(x: jax.Array, sentinel) -> jax.Array:
    """Sort ascending and replace duplicates with ``sentinel``, re-sorted.

    Device equivalent of the std::set/unordered_map dedup in the C++
    samplers; padding uses ``sentinel`` (= num_nodes) which sorts last.
    """
    x = jnp.sort(x, axis=-1)
    prev = jnp.concatenate([jnp.full_like(x[..., :1], -1), x[..., :-1]], axis=-1)
    x = jnp.where(x == prev, sentinel, x)
    return jnp.sort(x, axis=-1)
