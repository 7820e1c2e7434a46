"""Head-major residency microbench (VERDICT r4 next #4 scouting).

Question: if GAT activations stay [b, h, n, dh] BETWEEN layers, does
the next layer's transform matmul (contraction over the full flat
feature axis, i.e. over BOTH h and dh) cost a relayout copy that eats
the savings from dropping the per-layer combine transpose?

Arms (papers_gat3 shape: b=64, n=408, F=800, h=4, dh=200), each = the
per-layer transform work of ONE GAT layer (two linears off the same x,
combine, next-layer handoff), fwd+bwd:

  flat     x [b,n,F] -> einsum bnf,fhd->bhnd (current head-major
           entry) ... combine -> transpose back to [b,n,F]  (today's
           per-layer round trip)
  resident x [b,h,n,dh] -> einsum bhnd,hdke->bkne, combine stays
           head-major, NO transpose
  resident_2step  x_hm -> dot over (h,d) expressed per-head then
           reduced, in case XLA lowers the 4-D contraction badly

Prints ms/call for each arm.
"""
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

B, N, F, H = 64, 408, 800, 4
DH = F // H
STEPS = 30


def bench(fn, *args):
    fn = jax.jit(fn)
    out = fn(*args)
    jax.block_until_ready(out)
    _ = float(jax.tree_util.tree_leaves(out)[0].sum())
    t0 = time.time()
    for _ in range(STEPS):
        out = fn(*args)
    _ = float(jax.tree_util.tree_leaves(out)[0].sum())
    return (time.time() - t0) / STEPS * 1e3


def main():
    jax.config.update("jax_default_matmul_precision", "bfloat16")
    rng = np.random.default_rng(0)
    x_flat = jnp.asarray(rng.normal(size=(B, N, F)).astype(np.float32))
    x_hm = jnp.asarray(np.ascontiguousarray(
        np.transpose(np.asarray(x_flat).reshape(B, N, H, DH), (0, 2, 1, 3))))
    w1 = jnp.asarray(rng.normal(size=(F, F)).astype(np.float32) * 0.01)
    w2 = jnp.asarray(rng.normal(size=(F, F)).astype(np.float32) * 0.01)

    def flat_layer(x, w1, w2):
        # current: flat in -> head-major linears -> combine -> flat out
        a = jnp.einsum("bnf,fhd->bhnd", x, w1.reshape(F, H, DH))
        c = jnp.einsum("bnf,fhd->bhnd", x, w2.reshape(F, H, DH))
        out = (a + jax.nn.relu(c)) / 2.0
        return jnp.transpose(out, (0, 2, 1, 3)).reshape(B, N, F)

    def resident_layer(x, w1, w2):
        # head-major in -> 4-D contraction -> head-major out, no transpose
        w14 = w1.reshape(H, DH, H, DH)
        w24 = w2.reshape(H, DH, H, DH)
        a = jnp.einsum("bhnd,hdke->bkne", x, w14)
        c = jnp.einsum("bhnd,hdke->bkne", x, w24)
        return (a + jax.nn.relu(c)) / 2.0

    def resident_2step(x, w1, w2):
        # per-input-head partial matmuls reduced over h
        w13 = w1.reshape(H, DH, F)
        w23 = w2.reshape(H, DH, F)
        a = jnp.einsum("bhnd,hdz->bnz", x, w13).reshape(B, N, H, DH)
        c = jnp.einsum("bhnd,hdz->bnz", x, w23).reshape(B, N, H, DH)
        a = jnp.transpose(a, (0, 2, 1, 3))
        c = jnp.transpose(c, (0, 2, 1, 3))
        return (a + jax.nn.relu(c)) / 2.0

    def with_grad(layer):
        def f(x, w1, w2):
            def loss(w1, w2):
                return (layer(x, w1, w2) ** 2).sum()
            return jax.value_and_grad(loss, argnums=(0, 1))(w1, w2)
        return f

    res = {}
    for name, layer, x in (("flat", flat_layer, x_flat),
                           ("resident", resident_layer, x_hm),
                           ("resident_2step", resident_2step, x_hm)):
        res[f"{name}_fwd_ms"] = round(bench(layer, x, w1, w2), 3)
        res[f"{name}_fwdbwd_ms"] = round(bench(with_grad(layer), x, w1, w2), 3)
    import json
    res["platform"] = jax.devices()[0].platform
    print(json.dumps(res))


if __name__ == "__main__":
    main()


def nminor_check():
    """n-minor residency probe: x stored [b, h, dh, n] makes (h, dh)
    physically adjacent-major, so the transform contraction needs no
    input relayout; output [b, k, e, n] stays n-minor."""
    import json
    jax.config.update("jax_default_matmul_precision", "bfloat16")
    rng = np.random.default_rng(0)
    x_nm = jnp.asarray(rng.normal(size=(B, H, DH, N)).astype(np.float32))
    w1 = jnp.asarray(rng.normal(size=(F, F)).astype(np.float32) * 0.01)
    w2 = jnp.asarray(rng.normal(size=(F, F)).astype(np.float32) * 0.01)

    def nminor_layer(x, w1, w2):
        w14 = w1.reshape(H, DH, H, DH)
        w24 = w2.reshape(H, DH, H, DH)
        a = jnp.einsum("bhdn,hdke->bken", x, w14)
        c = jnp.einsum("bhdn,hdke->bken", x, w24)
        return (a + jax.nn.relu(c)) / 2.0

    def with_grad(layer):
        def f(x, w1, w2):
            def loss(x, w1, w2):
                return (layer(x, w1, w2) ** 2).sum()
            return jax.value_and_grad(loss, argnums=(0, 1, 2))(x, w1, w2)
        return f

    out = {"nminor_fwd_ms": round(bench(nminor_layer, x_nm, w1, w2), 3),
           "nminor_fwdbwd_ms": round(bench(with_grad(nminor_layer),
                                           x_nm, w1, w2), 3)}
    print(json.dumps(out))


if os.environ.get("HM_NMINOR") == "1":
    nminor_check()
