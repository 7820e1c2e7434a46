"""TPU gather-primitive microbench — design data for the induction path.

The cold-path induction is gather-bound; XLA TPU lowers different
gather spellings wildly differently (element gathers ~10 ns/element,
lax.gather with multi-element slices as a SERIAL dynamic-slice loop).
This measures the candidates on the real chip:

  elem_1d     x[idx] for 1-D x, idx [M]            (the cand gathers)
  row8/32/128 x2d[row_idx] for x2d [R, W]          (W-wide row gather)
  slice_gather lax.gather slice_sizes=(W,)         (the serial loop)
  take_along  take_along_axis over [B, N] tables

Prints ns/element for each at sizes matching the flagship/collab
induction shapes.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench(fn, *args, n=20):
    out = fn(*args)
    _ = float(out.sum())
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    _ = float(out.sum())
    return (time.time() - t0) / n


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    rng = np.random.default_rng(0)
    e_tab = 1_000_000                      # ~flagship indices size
    res = {"platform": jax.devices()[0].platform}
    tab = jnp.asarray(rng.integers(0, 1 << 30, e_tab, dtype=np.int64)
                      .astype(np.int32))

    for m in (200_000, 800_000):
        idx = jnp.asarray(rng.integers(0, e_tab, m).astype(np.int32))
        f = jax.jit(lambda t, i: t[i])
        dt = bench(f, tab, idx)
        res[f"elem_1d_m{m//1000}k_ns_per_elt"] = round(dt / m * 1e9, 2)

    for w in (8, 32, 128):
        tab2 = tab[: (e_tab // w) * w].reshape(-1, w)
        rows = e_tab // w
        for m_rows in (25_000, 100_000):
            idx = jnp.asarray(rng.integers(0, rows, m_rows).astype(np.int32))
            f = jax.jit(lambda t, i: t[i])
            dt = bench(f, tab2, idx)
            res[f"row{w}_m{m_rows//1000}k_ns_per_elt"] = round(
                dt / (m_rows * w) * 1e9, 2)
            res[f"row{w}_m{m_rows//1000}k_ns_per_row"] = round(
                dt / m_rows * 1e9, 1)

    # lax.gather with multi-element slices (known-serial suspect)
    def slice_gather(t, starts, w):
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1,), collapsed_slice_dims=(), start_index_map=(0,))
        return jax.lax.gather(t, starts.reshape(-1, 1), dn,
                              slice_sizes=(w,),
                              mode=jax.lax.GatherScatterMode.CLIP)
    for w in (64,):
        m_rows = 13_312                    # flagship: 64 x 208 members
        idx = jnp.asarray(rng.integers(0, e_tab - w, m_rows)
                          .astype(np.int32))
        f = jax.jit(lambda t, i: slice_gather(t, i, w))
        dt = bench(f, tab, idx, n=5)
        res[f"slice_gather_w{w}_ns_per_row"] = round(dt / m_rows * 1e9, 1)

    # take_along_axis over per-subgraph tables ([B, N] gathered at [B, E])
    b, n, e = 64, 208, 2398
    t2 = jnp.asarray(rng.integers(0, 1 << 20, (b, n)).astype(np.int32))
    i2 = jnp.asarray(rng.integers(0, n, (b, e)).astype(np.int32))
    f = jax.jit(lambda t, i: jnp.take_along_axis(t, i, axis=-1))
    dt = bench(f, t2, i2)
    res["take_along_b64_ns_per_elt"] = round(dt / (b * e) * 1e9, 2)

    print(json.dumps(res))


if __name__ == "__main__":
    main()
