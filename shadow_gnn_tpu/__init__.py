"""shaDow-GNN TPU: a TPU-native framework for decoupled-depth/scope GNNs.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
facebookresearch/shaDow_GNN ("Decoupling the Depth and Scope of Graph
Neural Networks", NeurIPS 2021).  Nothing here is a port: the reference
is a single-GPU PyTorch trainer fed by a CPU/OpenMP subgraph sampler;
this framework runs subgraph sampling, induction, and all GNN compute as
batched static-shape device programs:

  * subgraph batches are block-*padded* ``[B, N, N]`` dense adjacency
    blocks (MXU-friendly) instead of host-concatenated block-diagonal
    scipy CSR (reference ``graph.py:280-320`` / ``minibatch.py``),
  * the four samplers (node-IID / k-hop / PPR / stochastic-PPR,
    reference ``ParallelSampler.cpp:498-650``) are jitted gather
    programs over an HBM-resident CSR,
  * multi-chip scaling uses ``jax.sharding.Mesh`` + collectives instead
    of (nonexistent in the reference) NCCL/MPI.

Subpackages
-----------
data      dataset registry, shaDow on-disk format IO, synthetic graphs
sampling  PPR precompute + device-side samplers + subgraph induction
ops       segment/normalization/spmm primitives incl. Pallas kernels
nn        GNN layers (GCN/SAGE/GIN/GAT/...), ResPool, DeepGNN model
train     config parsing, metrics, logging, checkpointing, train loop
parallel  mesh/sharding helpers, data-parallel train step
postproc  Correct&Smooth, subgraph-ensemble postprocessing
"""

__version__ = "0.1.0"

# Mode constants, mirroring the reference's graph_engine/frontend/__init__.py
TRAIN, VALID, TEST = 0, 1, 2
MODE2STR = {TRAIN: "train", VALID: "valid", TEST: "test"}
STR2MODE = {v: k for k, v in MODE2STR.items()}
