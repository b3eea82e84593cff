"""Debug / sanitizer toggles: the functional-model replacement for races.

The reference avoids data races structurally (workers get pickled copies,
only the main thread mutates shared state — SURVEY.md §5.2); JAX's pure
functional model excludes them entirely. What replaces "sanitizers" here:

* ``enable_nan_checks()`` — jax_debug_nans: every jitted computation re-runs
  de-optimized when it produces a NaN and raises at the offending primitive
  (catches e.g. invalid material-table values during training).
* ``enable_deterministic()`` — bitwise-reproducible reductions across runs
  (XLA deterministic-ops flag), for debugging psum'd gradients.
* ``check_no_aliasing(tree_a, tree_b)`` — asserts two pytrees share no
  buffers (donation/aliasing mistakes surface as spooky mutation).
"""

from __future__ import annotations

import os

import jax


def enable_nan_checks(enable: bool = True) -> None:
    jax.config.update("jax_debug_nans", enable)


def enable_deterministic() -> None:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_gpu_deterministic_ops=true"
    )
    # TPU reductions are deterministic for fixed shapes/topologies by default;
    # the flag matters for CPU/GPU test parity.


def check_no_aliasing(tree_a, tree_b) -> None:
    ids_a = {id(x) for x in jax.tree_util.tree_leaves(tree_a)}
    for leaf in jax.tree_util.tree_leaves(tree_b):
        assert id(leaf) not in ids_a, "pytrees alias the same buffer"
