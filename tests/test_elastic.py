"""Fault injection + elastic recovery (SURVEY.md §5.3, VERDICT r1 item 7).

Scenario: a 2-process distributed training job loses process 1 mid-run
(simulated hard exit at step 3 of 6). Assertions:

1. **failure detection** — the surviving process exits NONZERO within the
   fail-fast budget instead of hanging forever (the reference's failure
   mode: a dead pool worker strands its pixels, init.py:190);
2. **elastic recovery** — a relaunch with a DIFFERENT topology (single
   process) resumes from the latest checkpoint and completes the job;
3. **correctness** — the recovered final state equals an uninterrupted
   single-process run exactly (steps are deterministic and the checkpoint
   holds full replicated state).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tools", "elastic_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _env():
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)
    return env


def _run_single(ckpt, steps=6, timeout=240):
    p = subprocess.run(
        [sys.executable, WORKER, "--ckpt", ckpt, "--steps", str(steps)],
        capture_output=True, text=True, env=_env(), cwd=REPO, timeout=timeout,
    )
    assert p.returncode == 0, p.stderr[-2000:]
    return json.loads(p.stdout.strip().splitlines()[-1])


def test_host_drop_failfast_and_elastic_resume(tmp_path):
    ckpt = str(tmp_path / "ckpt")
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, "--coordinator", f"127.0.0.1:{port}",
             "--nprocs", "2", "--pid", str(pid), "--ckpt", ckpt,
             "--steps", "6", "--crash-at", "3", "--step-timeout", "30"],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            env=_env(), cwd=REPO, text=True,
        )
        for pid in range(2)
    ]
    rcs = []
    for p in procs:
        out, err = p.communicate(timeout=200)
        rcs.append(p.returncode)
    # process 1 crashed by injection; process 0 must FAIL FAST, not hang
    # (heartbeat detection or the step watchdog — either is a detection)
    assert rcs[1] != 0, "fault injection did not fire"
    assert rcs[0] != 0, "survivor should not report success after peer loss"

    # the checkpoint from the completed steps exists
    saved = sorted(os.listdir(ckpt))
    assert saved, "no checkpoint was written before the crash"
    assert int(saved[-1][5:-4]) >= 3

    # elastic resume: ONE process finishes the job from the checkpoint
    resumed = _run_single(ckpt, steps=6)
    assert len(resumed["losses"]) == 6 - int(saved[-1][5:-4])

    # equals an uninterrupted single-process run of all 6 steps
    clean = _run_single(str(tmp_path / "ckpt_clean"), steps=6)
    np.testing.assert_allclose(resumed["table"], clean["table"], rtol=1e-6)
    np.testing.assert_allclose(resumed["table_sum"], clean["table_sum"],
                               rtol=1e-6)
