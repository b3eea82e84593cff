"""Why is a gather inside a lax loop ~20x slower than standalone?

Experiments (N=393216 indices, table = default-scene cell_word ~6M int32):
  A. standalone jitted gather (baseline)
  B. scan over precomputed [T, N] indices (loop context, NO dependency)
  C. while_loop with index chained through the gather result (dependency)
  D. C but with optimization_barrier isolating the gather
  E. C with sorted-ish (clustered) indices
  F. B with gather emitted via lax.gather directly
  G. C but 8 independent gathers per trip (throughput vs latency)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def t(fn, *a, iters=5):
    import jax
    out = fn(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*a)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp
    from python_raytracer_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()

    N = 393216
    T = 36
    M = 6_000_000
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.integers(1, 1 << 20, size=M), jnp.int32)
    idx = jnp.asarray(rng.integers(0, M, size=N), jnp.int32)
    idx_T = jnp.asarray(rng.integers(0, M, size=(T, N)), jnp.int32)
    idx_sorted = jnp.sort(idx)

    # A. standalone
    gA = jax.jit(lambda t_, i: t_[i])
    dt = t(gA, table, idx)
    print(f"A standalone gather:           {dt*1e3:8.3f} ms ({N/dt/1e9:.2f} G/s)")

    # B. scan, precomputed indices (no dependency)
    def fB(t_, iT):
        def body(acc, i):
            return acc + t_[i], None
        out, _ = jax.lax.scan(body, jnp.zeros((N,), jnp.int32), iT)
        return out
    dt = t(jax.jit(fB), table, idx_T)
    print(f"B scan indep gathers:          {dt*1e3:8.3f} ms (~{dt*1e3/T:.3f} ms/trip)")

    # C. while, chained index
    def fC(t_, i0):
        def body(s):
            acc, i, it = s
            w = t_[i]
            return acc + w, (i + w + 1) % M, it + 1
        out = jax.lax.while_loop(lambda s: s[2] < T, body,
                                 (jnp.zeros((N,), jnp.int32), i0, jnp.zeros((), jnp.int32)))
        return out[0]
    dt = t(jax.jit(fC), table, idx)
    print(f"C while chained gathers:       {dt*1e3:8.3f} ms (~{dt*1e3/T:.3f} ms/trip)")

    # D. C + optimization_barrier around gather inputs/outputs
    def fD(t_, i0):
        def body(s):
            acc, i, it = s
            (i_b,) = jax.lax.optimization_barrier((i,))
            w = t_[i_b]
            (w,) = jax.lax.optimization_barrier((w,))
            return acc + w, (i + w + 1) % M, it + 1
        out = jax.lax.while_loop(lambda s: s[2] < T, body,
                                 (jnp.zeros((N,), jnp.int32), i0, jnp.zeros((), jnp.int32)))
        return out[0]
    dt = t(jax.jit(fD), table, idx)
    print(f"D while + opt_barrier:         {dt*1e3:8.3f} ms (~{dt*1e3/T:.3f} ms/trip)")

    # E. C with clustered indices (locality): i stays near start
    def fE(t_, i0):
        def body(s):
            acc, i, it = s
            w = t_[i]
            return acc + w, (i + (w & 63)) % M, it + 1
        out = jax.lax.while_loop(lambda s: s[2] < T, body,
                                 (jnp.zeros((N,), jnp.int32), jnp.zeros_like(i0), jnp.zeros((), jnp.int32)))
        return out[0]
    dt = t(jax.jit(fE), table, idx_sorted)
    print(f"E while clustered gathers:     {dt*1e3:8.3f} ms (~{dt*1e3/T:.3f} ms/trip)")

    # G. 8 independent gathers per trip, T/8-ish trips -> throughput test
    def fG(t_, i0):
        def body(s):
            acc, i, it = s
            tot = jnp.zeros_like(acc)
            for k in range(8):
                tot = tot + t_[(i + k * 977) % M]
            return acc + tot, (i + 7919) % M, it + 1
        out = jax.lax.while_loop(lambda s: s[2] < T, body,
                                 (jnp.zeros((N,), jnp.int32), i0, jnp.zeros((), jnp.int32)))
        return out[0]
    dt = t(jax.jit(fG), table, idx)
    print(f"G while 8x gathers/trip:       {dt*1e3:8.3f} ms (~{dt*1e3/T/8:.3f} ms/gather)")

    # H. scan indep gathers, but small table that fits VMEM (64k words)
    small = table[: 1 << 16]
    idxs = idx_T % (1 << 16)
    def fH(t_, iT):
        def body(acc, i):
            return acc + t_[i], None
        out, _ = jax.lax.scan(body, jnp.zeros((N,), jnp.int32), iT)
        return out
    dt = t(jax.jit(fH), small, idxs)
    print(f"H scan gathers, 256KB table:   {dt*1e3:8.3f} ms (~{dt*1e3/T:.3f} ms/trip)")


if __name__ == "__main__":
    main()
