"""Real 2-process jax.distributed test for parallel/multihost.py.

Spawns two worker processes over a local coordinator (CPU backend, one
device each -> a 2-device global mesh across processes) and runs
init_distributed + host_local_rays + the sharded train step + gather_image
end to end. Asserts both processes agree and the distributed losses match a
single-process run of the identical step (the multi-host psum must not
change the math). SURVEY.md §5.8 / VERDICT round-1 item 8.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tools", "multihost_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_train_step():
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # don't inherit the test session's virtual-device flags
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, "--coordinator", f"127.0.0.1:{port}",
             "--nprocs", "2", "--pid", str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, cwd=REPO,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=240)
        assert p.returncode == 0, f"worker failed:\n{err[-2000:]}"
        outs.append(json.loads(out.strip().splitlines()[-1]))

    a, b = outs
    assert a["process_count"] == b["process_count"] == 2
    assert a["device_count"] == b["device_count"] == 2
    # replicated outputs must be identical on both hosts
    assert a["losses"] == b["losses"]
    assert a["table_sum"] == b["table_sum"]
    assert a["image_sum"] == b["image_sum"]
    assert a["image_shape"] == [64, 3]

    # distributed == single-process (the psum'd step computes the same math)
    import jax
    import jax.numpy as jnp
    import optax

    sys.path.insert(0, REPO)
    from python_raytracer_tpu.parallel.train import make_train_step
    from tools.tiny_scene import build_tiny

    st, cs, rays, target = build_tiny()
    opt = optax.sgd(1e-2)
    step = make_train_step(st, cs.spec, opt, programs_used=cs.programs_used)
    opt_state = opt.init(cs.arrays.material_table)
    arrays, key = cs.arrays, jax.random.PRNGKey(0)
    losses = []
    for _ in range(3):
        arrays, opt_state, loss = step(arrays, opt_state, rays, target, key)
        losses.append(float(loss))
    np.testing.assert_allclose(losses, a["losses"], rtol=1e-6)
