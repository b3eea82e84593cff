"""Trustworthy timing on the axon-tunneled TPU.

``block_until_ready`` does NOT synchronize on the axon platform (measured:
a 212 ms chained-gather program "completes" in 0.02 ms under it). The only
reliable fence is a host readback of output *data*. Device executions on one
stream are serialized, so the harness launches K calls and reads back a tiny
slice of the LAST output: total = K * exec_time + 1 tunnel RTT, with RTT
measured separately and subtracted.
"""

import time

import numpy as np


def rtt_ms(reps: int = 3) -> float:
    """Median tunnel round-trip for a trivial execution + 8-byte readback."""
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda x: x + 1)
    x = jnp.zeros((2,), jnp.int32)
    np.asarray(f(x))  # compile + warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(f(x))
        ts.append((time.perf_counter() - t0) * 1e3)
    return float(np.median(ts))


def time_fn_ms(fn, args_list, *, slice_out=None, warmup: bool = True) -> float:
    """Per-call milliseconds of ``fn`` over ``args_list`` (K launches, one
    readback fence at the end, RTT subtracted). ``fn`` must return an array
    or pytree; ``slice_out`` optionally maps the output to a small array to
    keep readback bytes negligible."""
    import jax

    k = len(args_list)
    if warmup:
        out = fn(*args_list[0])
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray((slice_out(out) if slice_out else leaf.ravel()[:4]))
    base = rtt_ms()
    t0 = time.perf_counter()
    out = None
    for a in args_list:
        out = fn(*a)
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray((slice_out(out) if slice_out else leaf.ravel()[:4]))
    total = (time.perf_counter() - t0) * 1e3
    return max(0.0, (total - base)) / k
