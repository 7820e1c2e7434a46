"""Microbench: GATConv fwd+bwd at leaderboard shapes, variant A/B.

Isolates the layer stack (3x GATConv + loss reduction) from the full
Trainer so layout experiments iterate in seconds: one jit, one shape,
no sampling/induction.  Used to attribute the papers_gat3 step time
between the attention kernel, the per-head norm/score machinery, and
XLA layout copies (BENCH.md round-3 GAT sections).

Usage: python scripts/gat_layer_microbench.py [--n 408] [--dim 800]
       [--heads 4] [--batch 64] [--layers 3] [--variant fused|dense]
"""
import argparse
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=408)
    ap.add_argument("--dim", type=int, default=800)
    ap.add_argument("--heads", type=int, default=4)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--layers", type=int, default=3)
    ap.add_argument("--feat", type=int, default=128)
    ap.add_argument("--variant", default="fused", choices=["fused", "dense"])
    ap.add_argument("--platform", default=None)
    ap.add_argument("--trace", action="store_true")
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_default_matmul_precision", "bfloat16")
    jax.config.update("jax_default_prng_impl", "rbg")
    import jax.numpy as jnp
    import flax.linen as nn
    import optax
    from shadow_gnn_tpu.nn.layers import GATConv

    b, n, d, h, L = args.batch, args.n, args.dim, args.heads, args.layers
    rng = np.random.default_rng(0)
    adj = (rng.random((b, n, n)) < 0.05).astype(np.float32)
    adj = np.maximum(adj, np.swapaxes(adj, 1, 2))
    np.einsum("bii->bi", adj)[:] = 1.0
    mask = np.ones((b, n), np.float32)
    feat = rng.normal(size=(b, n, args.feat)).astype(np.float32)

    class Stack(nn.Module):
        @nn.compact
        def __call__(self, x, adj, mask, *, train: bool):
            for _ in range(L):
                x = GATConv(dim_out=d, mulhead=h, act="prelu",
                            dropout=0.1 if train else 0.0,
                            fused_att=(args.variant == "fused"))(
                    x, adj, adj, mask, train=train)
            return x

    model = Stack()
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(feat),
                        jnp.asarray(adj), jnp.asarray(mask), train=False)
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, x, adj, mask, key):
        def lf(p):
            out = model.apply(p, x, adj, mask, train=True,
                              rngs={"dropout": key})
            return (out ** 2).mean()
        loss, grads = jax.value_and_grad(lf)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    xs = jnp.asarray(feat)
    adj_d = jnp.asarray(adj)
    mask_d = jnp.asarray(mask)
    key = jax.random.PRNGKey(1)
    t0 = time.time()
    params, opt_state, loss = step(params, opt_state, xs, adj_d, mask_d, key)
    _ = float(loss)
    print(f"compile+first: {time.time() - t0:.1f}s", file=sys.stderr)
    times = []
    for _ in range(10):
        t0 = time.time()
        params, opt_state, loss = step(params, opt_state, xs, adj_d,
                                       mask_d, key)
        _ = float(loss)
        times.append(time.time() - t0)
    ms = min(times) * 1e3
    print(f'{{"variant": "{args.variant}", "B": {b}, "N": {n}, "dim": {d}, '
          f'"heads": {h}, "layers": {L}, "step_ms": {ms:.2f}}}')
    if args.trace:
        tdir = f"/tmp/gat_micro_trace_{args.variant}"
        jax.profiler.start_trace(tdir)
        params, opt_state, loss = step(params, opt_state, xs, adj_d,
                                       mask_d, key)
        _ = float(loss)
        jax.profiler.stop_trace()
        print(f"trace -> {tdir}", file=sys.stderr)


if __name__ == "__main__":
    main()
