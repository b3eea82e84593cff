"""Multi-host worker: one process of a jax.distributed CPU job.

Used by tests/test_multihost.py (2 processes over a local coordinator) and
as the minimal template for a real pod deployment: initialize, build the
global mesh, feed host-local rays, run the sharded train step, gather the
rendered image. Prints one JSON line with checksums for the test to compare
across processes and against the single-process reference.
"""

import argparse
import json
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--nprocs", type=int, required=True)
    ap.add_argument("--pid", type=int, required=True)
    args = ap.parse_args()

    import jax

    # The axon sitecustomize forces JAX_PLATFORMS=axon; override in-process.
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    import optax

    from python_raytracer_tpu.parallel.multihost import (
        gather_image,
        global_mesh,
        host_local_rays,
        init_distributed,
    )
    from python_raytracer_tpu.parallel.train import make_train_step
    from python_raytracer_tpu.ops.march import RayBatch
    from tools.tiny_scene import build_tiny

    init_distributed(coordinator_address=args.coordinator,
                     num_processes=args.nprocs, process_id=args.pid)
    assert jax.process_count() == args.nprocs, jax.process_count()
    mesh = global_mesh()

    st, cs, rays, target = build_tiny()
    n = rays.pos.shape[0]
    per = n // args.nprocs
    lo, hi = args.pid * per, (args.pid + 1) * per
    local = RayBatch(pos=rays.pos[lo:hi], vel=rays.vel[lo:hi],
                     life=rays.life[lo:hi])
    grays = host_local_rays(mesh, local)
    gtarget = jax.make_array_from_process_local_data(
        jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("data")),
        np.asarray(target[lo:hi]), (n,) + target.shape[1:])

    opt = optax.sgd(1e-2)
    step = make_train_step(st, cs.spec, opt, mesh=mesh,
                           programs_used=cs.programs_used)
    opt_state = opt.init(cs.arrays.material_table)
    arrays, key = cs.arrays, jax.random.PRNGKey(0)
    losses = []
    for _ in range(3):
        arrays, opt_state, loss = step(arrays, opt_state, grays, gtarget, key)
        losses.append(float(loss))

    from python_raytracer_tpu.parallel.train import render_colors
    colors = render_colors(st.replace(exact=False), cs.spec, arrays, grays)
    img = gather_image(colors)

    print(json.dumps({
        "pid": args.pid,
        "process_count": jax.process_count(),
        "device_count": jax.device_count(),
        "losses": losses,
        "table_sum": float(np.asarray(arrays.material_table).sum()),
        "image_shape": list(img.shape),
        "image_sum": float(img.sum()),
    }), flush=True)


if __name__ == "__main__":
    sys.path.insert(0, __file__.rsplit("/", 2)[0])
    main()
