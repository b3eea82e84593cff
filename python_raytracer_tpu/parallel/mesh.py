"""Device mesh + sharding helpers.

The reference's only parallel axis is pixels scattered over pool workers by
``(x ^ y) % threads`` with pickle transport (reference ``data.py:70-77``,
``init.py:205``). The TPU build shards the ray batch over a
``jax.sharding.Mesh`` instead: the scene arrays (grids + material table) are
replicated device-resident (no per-frame broadcast), rays are split on the
batch axis, and gradient reduction is an XLA ``psum`` inserted automatically
by jit from the sharding annotations (SURVEY.md §2.2, §2.3).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axes: Sequence[str] = ("data",)) -> Mesh:
    """1D (or reshaped) mesh over the first n devices."""
    devices = jax.devices()
    n = n_devices or len(devices)
    devs = np.array(devices[:n])
    if len(axes) == 1:
        return Mesh(devs, axes)
    # Factor n over the requested axes as evenly as possible (data major).
    shape = [1] * len(axes)
    rem = n
    for i in range(len(axes) - 1, 0, -1):
        f = 2
        while rem % f and f <= rem:
            f += 1
        if rem % f == 0 and rem > 1:
            shape[i] = f
            rem //= f
    shape[0] = rem
    return Mesh(devs.reshape(shape), axes)


def ray_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (ray batch) axis."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_multiple(n: int, mult: int) -> int:
    return ((n + mult - 1) // mult) * mult
