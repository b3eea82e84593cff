"""Warm the persistent compile cache + A/B the kernel perf levers on TPU.

Runs ``bench.py`` (the real thing, parent watchdog included) once per
config, so every program it compiles is byte-identical to what the
driver's BENCH run will trace — the .jax_cache entries this run writes are
guaranteed cache HITS for the driver. Results append to a JSONL log.

Round-2/3 lesson this tool exists for: the blockmarch compile (2.5-8 min
healthy, 25-55+ min on a degraded tunnel) never survived a deadline-bound
bench run, so .jax_cache never got the entry and two rounds shipped
value 0.0. This run has NO deadline pressure: give each config a huge
budget and let the remote compiler grind.

Usage:  python3 tools/warm_bench.py [log_path]   (default /tmp/warm_r3.jsonl)
Env:    WARM_CONFIGS — JSON list of env-override dicts (optional).
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Most-important-first: the committed bench default MUST land in the cache;
# the rest are the VERDICT-item-2 A/B sweep (supersteps / byte_planes /
# group_coarse), each fwd+bwd so the winner is directly usable as default.
DEFAULT_CONFIGS = [
    {},  # bench defaults: tile=2048, supersteps=1, ep32/inner24, fwd+bwd
    {"BENCH_SUPERSTEPS": "2"},
    {"BENCH_BYTE_PLANES": "1"},
    {"BENCH_SUPERSTEPS": "2", "BENCH_BYTE_PLANES": "1"},
    {"BENCH_SUPERSTEPS": "4", "BENCH_BYTE_PLANES": "1"},
    {"BENCH_GROUP_COARSE": "1", "BENCH_SUPERSTEPS": "2",
     "BENCH_BYTE_PLANES": "1"},
]


def main():
    log_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/warm_r3.jsonl"
    configs = json.loads(os.environ.get("WARM_CONFIGS", "null")) \
        or DEFAULT_CONFIGS
    budget = os.environ.get("WARM_DEADLINE_SEC", "7200")
    for i, cfg in enumerate(configs):
        env = {k: v for k, v in os.environ.items()
               if not k.startswith("BENCH_")}
        env.update(cfg)
        env["BENCH_DEADLINE_SEC"] = budget
        env["BENCH_STALL_SEC"] = os.environ.get("WARM_STALL_SEC", "300")
        t0 = time.time()
        # Stream child stdout/stderr to files so a multi-hour compile can be
        # monitored live (bench's parent prints progress events on stderr).
        out_path = log_path + f".cfg{i}.out"
        err_path = log_path + f".cfg{i}.err"
        with open(out_path, "w") as fo, open(err_path, "w") as fe:
            proc = subprocess.run(
                [sys.executable, os.path.join(REPO, "bench.py")],
                env=env, stdout=fo, stderr=fe, text=True)
        stdout = open(out_path).read()
        stderr = open(err_path).read()
        line = (stdout.strip().splitlines() or ["{}"])[-1]
        try:
            result = json.loads(line)
        except ValueError:
            result = {"raw": line[:500]}
        rec = {"config": cfg, "wall_sec": round(time.time() - t0, 1),
               "rc": proc.returncode, "result": result,
               "stderr_tail": stderr.strip().splitlines()[-3:]}
        with open(log_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
