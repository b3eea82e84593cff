"""Elastic training worker: one process of a fault-tolerant distributed job.

Used by tests/test_elastic.py: supports fault injection (--crash-at) and
resume-from-checkpoint with ANY process count (elastic downscale after a
host drop). Prints one JSON line on success.
"""

import argparse
import json
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", default=None)
    ap.add_argument("--nprocs", type=int, default=1)
    ap.add_argument("--pid", type=int, default=0)
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--crash-at", type=int, default=None)
    ap.add_argument("--step-timeout", type=float, default=45.0)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import optax

    from python_raytracer_tpu.ops.march import RayBatch
    from python_raytracer_tpu.parallel.multihost import global_mesh, host_local_rays
    from python_raytracer_tpu.parallel.train import make_train_step
    from python_raytracer_tpu.runtime.elastic import (
        init_distributed_failfast,
        resumable_train,
    )
    from tools.tiny_scene import build_tiny

    if args.nprocs > 1:
        init_distributed_failfast(args.coordinator, args.nprocs, args.pid,
                                  initialization_timeout=45,
                                  heartbeat_timeout_seconds=10)

    st, cs, rays, target = build_tiny()
    n = rays.pos.shape[0]
    key = jax.random.PRNGKey(0)
    opt = optax.sgd(1e-2)
    opt_state = opt.init(cs.arrays.material_table)

    if args.nprocs > 1:
        mesh = global_mesh()
        per = n // args.nprocs
        lo, hi = args.pid * per, (args.pid + 1) * per
        grays = host_local_rays(mesh, RayBatch(
            pos=rays.pos[lo:hi], vel=rays.vel[lo:hi], life=rays.life[lo:hi]))
        gtarget = jax.make_array_from_process_local_data(
            jax.sharding.NamedSharding(
                mesh, jax.sharding.PartitionSpec("data")),
            np.asarray(target[lo:hi]), (n,) + target.shape[1:])
        step = make_train_step(st, cs.spec, opt, mesh=mesh,
                               programs_used=cs.programs_used)
    else:
        grays, gtarget = rays, target
        step = make_train_step(st, cs.spec, opt,
                               programs_used=cs.programs_used)

    def step_fn(arrays, opt_state):
        return step(arrays, opt_state, grays, gtarget, key)

    arrays, opt_state, losses = resumable_train(
        step_fn, cs.arrays, opt_state, args.steps, args.ckpt,
        save_every=1, step_timeout_s=args.step_timeout,
        is_saver=args.pid == 0, crash_at=args.crash_at if args.pid == 1 else None,
    )
    print(json.dumps({
        "pid": args.pid,
        "losses": losses,
        "table_sum": float(np.asarray(arrays.material_table).sum()),
        "table": np.asarray(arrays.material_table).ravel()[:8].tolist(),
    }), flush=True)


if __name__ == "__main__":
    sys.path.insert(0, __file__.rsplit("/", 2)[0])
    main()
