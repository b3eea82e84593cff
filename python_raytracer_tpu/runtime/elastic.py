"""Failure detection + elastic recovery for training (SURVEY.md §5.3).

The reference has no failure story: a dead pool worker strands its pixel set
forever (``busy[t]`` never cleared, reference ``init.py:190``) and the app
hangs. The TPU build replaces that with the standard JAX multi-host
practice:

* **fail-fast initialization** — ``init_distributed_failfast`` bounds both
  the cluster-formation wait (``initialization_timeout``) and the
  coordinator heartbeat (``heartbeat_timeout_seconds``), so a missing or
  dead peer turns into a prompt error instead of an infinite wait;
* **step watchdog** — every training step is fenced by a host readback
  under a watchdog timer: if a collective hangs (peer died mid-psum, link
  wedged), the process exits with ``STEP_TIMEOUT_EXIT`` instead of blocking
  forever — the application-level collective-timeout detector;
* **rerunnable steps** — ``resumable_train`` checkpoints the train state
  (material table, optimizer state, step index) every ``save_every`` steps
  and resumes from the latest checkpoint on restart, so a job can be
  relaunched after a host drop — with the same OR a different process
  count (elastic downscale/upscale): the checkpoint holds only replicated
  state, so any topology can resume it.

Fault-injection coverage: tests/test_elastic.py kills one of two live
processes mid-run and asserts (a) the survivor fails fast, (b) a relaunch
resumes from the checkpoint and finishes with the exact uninterrupted
result.
"""

from __future__ import annotations

import os
import threading
from typing import Callable, Optional, Tuple

import numpy as np

STEP_TIMEOUT_EXIT = 42


def init_distributed_failfast(coordinator_address: str, num_processes: int,
                              process_id: int,
                              initialization_timeout: int = 60,
                              heartbeat_timeout_seconds: int = 10) -> None:
    """jax.distributed.initialize with fail-fast timeouts."""
    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        initialization_timeout=initialization_timeout,
        heartbeat_timeout_seconds=heartbeat_timeout_seconds,
    )


def _fence_with_watchdog(value, timeout_s: float):
    """Host-read ``value``; hard-exit if the read blocks past the timeout
    (a hung collective — the reference's stranded-worker failure class)."""
    done = threading.Event()

    def fire():
        if not done.wait(timeout=timeout_s):
            os.write(2, b"step watchdog: collective timed out, failing fast\n")
            os._exit(STEP_TIMEOUT_EXIT)

    th = threading.Thread(target=fire, daemon=True)
    th.start()
    out = np.asarray(value)
    done.set()
    return out


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = [f for f in os.listdir(ckpt_dir)
             if f.startswith("step_") and f.endswith(".npz")]
    if not steps:
        return None
    return os.path.join(ckpt_dir, max(steps, key=lambda f: int(f[5:-4])))


def save_train_state(ckpt_dir: str, step: int, table, opt_state) -> str:
    """Atomic npz checkpoint of the replicated train state."""
    import jax

    os.makedirs(ckpt_dir, exist_ok=True)
    leaves, _ = jax.tree_util.tree_flatten(opt_state)
    path = os.path.join(ckpt_dir, f"step_{step:06d}.npz")
    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:
        np.savez(fh, step=np.int64(step), table=np.asarray(table),
                 **{f"opt_{i}": np.asarray(x) for i, x in enumerate(leaves)})
    os.replace(tmp, path)  # atomic: a crash mid-write never corrupts
    return path


def load_train_state(path: str, opt_state_template) -> Tuple[int, np.ndarray, object]:
    import jax
    import jax.numpy as jnp

    with np.load(path) as z:
        step = int(z["step"])
        table = jnp.asarray(z["table"])
        _, treedef = jax.tree_util.tree_flatten(opt_state_template)
        n = len(jax.tree_util.tree_leaves(opt_state_template))
        leaves = [jnp.asarray(z[f"opt_{i}"]) for i in range(n)]
        opt_state = jax.tree_util.tree_unflatten(treedef, leaves)
    return step, table, opt_state


def resumable_train(step_fn: Callable, arrays, opt_state, total_steps: int,
                    ckpt_dir: str, *, save_every: int = 1,
                    step_timeout_s: float = 120.0, is_saver: bool = True,
                    crash_at: Optional[int] = None,
                    on_step: Optional[Callable] = None):
    """Run ``total_steps`` of ``step_fn(arrays, opt_state) -> (arrays,
    opt_state, loss)``, resuming from the latest checkpoint in ``ckpt_dir``.

    ``is_saver``: only one process writes checkpoints (process 0).
    ``crash_at``: fault-injection hook — hard-exit before completing that
    step (used by tests to simulate a host drop mid-run).
    Returns (arrays, opt_state, losses).
    """
    import dataclasses

    start = 0
    path = latest_checkpoint(ckpt_dir)
    if path is not None:
        start, table, opt_state = load_train_state(path, opt_state)
        arrays = dataclasses.replace(arrays, material_table=table)

    losses = []
    for step in range(start, total_steps):
        if crash_at is not None and step == crash_at:
            os.write(2, b"fault injection: simulated host drop\n")
            os._exit(1)
        arrays, opt_state, loss = step_fn(arrays, opt_state)
        loss_h = float(_fence_with_watchdog(loss, step_timeout_s))
        losses.append(loss_h)
        if is_saver and (step + 1) % save_every == 0:
            save_train_state(ckpt_dir, step + 1, arrays.material_table,
                             opt_state)
        if on_step is not None:
            on_step(step, loss_h)
    return arrays, opt_state, losses
