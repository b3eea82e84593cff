"""Multi-host SPMD setup: one program over ICI/DCN.

The reference is single-machine only — its "distributed backend" is an
mp.Pool with pickle pipes (SURVEY.md §2.3). The TPU build scales the same
way every JAX workload does (SURVEY.md §5.8):

* ``init_distributed()`` — ``jax.distributed.initialize`` (coordinator from
  env or args); afterwards ``jax.devices()`` spans the whole slice and one
  jitted program runs SPMD across hosts;
* rays are sharded on the batch axis over the global mesh; each host
  generates/feeds only its local pixel rows
  (``host_local_rays``) — the scene arrays are replicated device-resident,
  so there is **no per-frame scene broadcast** (the reference re-pickles the
  whole chunk dict per dispatch, init.py:205);
* the material-table gradient psum is inserted by jit from the sharding
  annotations (parallel/train.py) and rides ICI within a slice / DCN across
  slices;
* display/checkpoint edges use ``process_allgather`` when a full image is
  needed on one host.

Scaling validation without a pod: tests run the identical code path on an
8-device virtual CPU mesh (tests/conftest.py), and the driver dry-runs the
sharded train step via __graft_entry__.dryrun_multichip.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from python_raytracer_tpu.ops.march import RayBatch


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None,
                     initialization_timeout: int = 120) -> None:
    """Initialize multi-host JAX. No-op when running single-process.

    Fail-fast by default: a missing peer aborts after
    ``initialization_timeout`` seconds instead of waiting forever
    (SURVEY.md §5.3; runtime/elastic.py has the full failure story)."""
    if num_processes is None and coordinator_address is None:
        return  # single process — nothing to do
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        initialization_timeout=initialization_timeout,
    )


def global_mesh(axes: Sequence[str] = ("data",)) -> Mesh:
    """1D mesh over every device in the job (all hosts)."""
    assert len(axes) == 1, "use parallel.mesh.make_mesh for multi-axis meshes"
    return Mesh(np.array(jax.devices()), axes)


def host_local_rays(mesh: Mesh, rays: RayBatch) -> RayBatch:
    """Assemble a globally-sharded RayBatch from per-host local shards.

    Each host passes the rays for its own slice of the pixel batch; the
    result is a global jax.Array sharded over the 'data' axis (the TPU
    equivalent of the reference's per-worker pixel sets, data.py:70-77 —
    but partitioned in contiguous blocks, which XLA prefers, instead of the
    (x ^ y) % threads interleave).
    """
    sharding = NamedSharding(mesh, P("data"))

    def shard(x):
        global_shape = (x.shape[0] * jax.process_count(),) + x.shape[1:]
        return jax.make_array_from_process_local_data(sharding, np.asarray(x), global_shape)

    return RayBatch(pos=shard(rays.pos), vel=shard(rays.vel), life=shard(rays.life))


def gather_image(image: jax.Array) -> np.ndarray:
    """Collect a (possibly sharded) rendered image onto every host."""
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(image, tiled=True))
