"""Online-serving latency / offline-export throughput benchmark.

Deployment scenario the training benches don't cover: a trained
shaDow model answering point queries — "embed/classify THESE nodes
now" — plus bulk embedding export.  Uses the flagship workload
(SAGE-3 dim=256, PPR k=200, 89k-node ER graph), PPR tables precomputed
over ALL nodes (the serving-side analog of the reference's
transductive-link protocol, minibatch.py:383-389: one table reused for
any query id), random-init params (latency is parameter-independent).

Measures, per request batch size B:
  * warm end-to-end request latency p50/p95 (ids in → probabilities out,
    including host<->device transfers and the PPR-row gather + device
    sample/induce/forward);
  * single-stream sustained queries/s.
Plus bulk export: full-graph embedding pass (subgraphs/s, scan-batched).

NOTE on the axon tunnel: each dispatch pays ~7 ms of RPC round-trip in
this session's setup (see BENCH.md "compile-time attack" notes); on a
locally-attached TPU runtime the per-request floor is ~100x lower.  The
bench reports the tunnel floor separately (empty-program dispatch) so
the compute-only latency is recoverable.

Usage: python scripts/serving_bench.py [--nodes 89000] [--batches 1,8,64,256]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=89000)
    ap.add_argument("--batches", type=str, default="1,8,64,256")
    ap.add_argument("--requests", type=int, default=100)
    ap.add_argument("--platform", type=str, default=None)
    ap.add_argument("--device_ppr", action="store_true",
                    help="force the device power-iteration PPR "
                         "precompute (measured 40-75x slower than the "
                         "native push; auto now always picks the push)")
    ap.add_argument("--host_ppr", action="store_true",
                    help="deprecated no-op: the native push is the default")
    args = ap.parse_args()
    if args.platform:
        os.environ["JAX_PLATFORMS"] = args.platform
        import jax
        jax.config.update("jax_platforms", args.platform)
    import jax
    import jax.numpy as jnp
    import numpy as np

    from shadow_gnn_tpu import TEST
    from shadow_gnn_tpu.data.synthetic import make_synthetic_dataset
    from shadow_gnn_tpu.train.config import parse_config
    from shadow_gnn_tpu.train.logger import Logger
    from shadow_gnn_tpu.train.metrics import Metrics
    from shadow_gnn_tpu.train.pipeline import Trainer

    n = args.nodes
    g = make_synthetic_dataset(num_nodes=n, avg_deg=10, num_feat=500,
                               num_classes=7, seed=0)
    # serving tables cover every node: make TEST the full id range
    g.node_set[TEST] = np.arange(n, dtype=np.int64)

    cfg = {
        "data": {"transductive": True},
        "architecture": {
            "dim": 256, "aggr": "sage", "loss": "softmax", "num_layers": 3,
            "act": "relu", "feature_augment": "hops", "residue": "none",
            "pooling": "center",
        },
        "hyperparameter": {"end": 1, "lr": 5e-4, "dropout": 0.45,
                           "dropedge": 0.05, "batch_size": 64},
        "sampler": [{"method": "ppr", "phase": "train", "k": [200],
                     "epsilon": [1e-6]}],
    }
    parsed = parse_config(cfg)
    metrics = Metrics("serve", False, "accuracy", 1)
    tr = Trainer("serve", "", g, parsed, metrics,
                 Logger(metrics, "/tmp/serve_bench", no_log=True), seed=0,
                 use_device_ppr=True if args.device_ppr else None,
                 prng_impl="rbg", matmul_precision="bfloat16")
    t0 = time.time()
    tr._ensure_tables(TEST)
    print(f"PPR tables over all {n} nodes: {time.time()-t0:.1f}s")
    out = {"nodes": n, "k": 200, "dim": 256}

    # tunnel dispatch floor: trivial jitted program, warm
    tiny = jax.jit(lambda x: x + 1)
    _ = float(tiny(jnp.float32(0.0)))
    ts = []
    for _ in range(50):
        t0 = time.time()
        _ = float(tiny(jnp.float32(0.0)))
        ts.append(time.time() - t0)
    out["dispatch_floor_ms_p50"] = round(1e3 * float(np.median(ts)), 2)

    # public point-query API (pads to shared compile buckets internally)
    rng = np.random.default_rng(3)
    lat = {}
    for b in [int(x) for x in args.batches.split(",")]:
        ids = rng.integers(0, n, size=b).astype(np.int64)
        _ = tr.predict_nodes(ids, mode=TEST)        # compile
        ts = []
        for _i in range(args.requests):
            ids = rng.integers(0, n, size=b).astype(np.int64)
            t0 = time.time()
            probs = tr.predict_nodes(ids, mode=TEST)
            assert probs.shape == (b, 7)
            ts.append(time.time() - t0)
        ts = np.array(ts)
        lat[b] = {
            "p50_ms": round(1e3 * float(np.percentile(ts, 50)), 2),
            "p95_ms": round(1e3 * float(np.percentile(ts, 95)), 2),
            "queries_per_s": round(b / float(np.mean(ts)), 1),
        }
        print(f"B={b}: {lat[b]}")
    out["request_latency"] = lat

    # bulk export: full-graph embeddings through the scan-batched path
    t0 = time.time()
    embs = tr.embed_full(modes=(TEST,))
    dt = time.time() - t0
    out["bulk_embed_subg_per_s"] = round(n / dt, 1)
    out["bulk_embed_s"] = round(dt, 1)
    assert embs[0].shape == (n, 256)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
