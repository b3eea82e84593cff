"""Debug / sanitizer toggles: the functional-model replacement for races.

The reference avoids data races structurally (workers get pickled copies,
only the main thread mutates shared state — SURVEY.md §5.2); JAX's pure
functional model excludes them entirely. What replaces "sanitizers" here:

* ``enable_nan_checks()`` — jax_debug_nans: every jitted computation re-runs
  de-optimized when it produces a NaN and raises at the offending primitive
  (catches e.g. invalid material-table values during training).
* ``check_no_aliasing(tree_a, tree_b)`` — asserts two pytrees share no
  buffers (donation/aliasing mistakes surface as spooky mutation); used by
  the checkpoint-restore test (tests/test_runtime_aux.py).

``enable_nan_checks`` is exposed as ``--nan-checks`` on tools/train_demo.py.
(TPU reductions are already deterministic for fixed shapes/topologies, so
no determinism toggle is needed here.)
"""

from __future__ import annotations

import jax


def enable_nan_checks(enable: bool = True) -> None:
    jax.config.update("jax_debug_nans", enable)


def check_no_aliasing(tree_a, tree_b) -> None:
    ids_a = {id(x) for x in jax.tree_util.tree_leaves(tree_a)}
    for leaf in jax.tree_util.tree_leaves(tree_b):
        assert id(leaf) not in ids_a, "pytrees alias the same buffer"
