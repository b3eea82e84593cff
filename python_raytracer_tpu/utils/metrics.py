"""Observability: structured metrics, profiling scopes, throughput meters.

The reference's only instrumentation is the FPS HUD (reference
``init.py:256-259``) and print warnings (SURVEY.md §5.1, §5.5). The TPU
build provides:

* ``trace_scope`` — ``jax.profiler`` named traces around engine phases
  (render / post / chunk / physics), visible in TensorBoard profiles;
* ``MarchStats`` — rays/s, steps/ray, bounces/ray computed from MarchResult
  (the per-ray step/bounce counters the reference carries on the ray record,
  init.py:55-57, aggregated on device);
* ``MetricLog`` — a lightweight structured scalar logger (JSON lines).
"""

from __future__ import annotations

import contextlib
import dataclasses
import json
import time
from typing import Optional

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace_scope(name: str):
    """Named profiler scope (shows up in jax.profiler / TensorBoard traces)."""
    with jax.profiler.TraceAnnotation(name):
        yield


@dataclasses.dataclass
class MarchStats:
    rays: int
    seconds: float
    mean_steps: float
    mean_bounces: float

    @property
    def mrays_per_s(self) -> float:
        return self.rays / self.seconds / 1e6 if self.seconds else 0.0

    @property
    def msteps_per_s(self) -> float:
        return self.rays * self.mean_steps / self.seconds / 1e6 if self.seconds else 0.0

    @classmethod
    def from_result(cls, result, seconds: float) -> "MarchStats":
        return cls(
            rays=int(result.step.shape[0]),
            seconds=seconds,
            mean_steps=float(jnp.mean(result.step)),
            mean_bounces=float(jnp.mean(result.bounces)),
        )

    def as_dict(self):
        return {
            "rays": self.rays,
            "sec": round(self.seconds, 5),
            "mrays_per_s": round(self.mrays_per_s, 4),
            "msteps_per_s": round(self.msteps_per_s, 3),
            "mean_steps": round(self.mean_steps, 2),
            "mean_bounces": round(self.mean_bounces, 3),
        }


class MetricLog:
    """JSON-lines scalar metric logger (stdout or file)."""

    def __init__(self, path: Optional[str] = None):
        self._fh = open(path, "a") if path else None

    def log(self, event: str, **scalars):
        rec = {"t": round(time.time(), 3), "event": event, **scalars}
        line = json.dumps(rec)
        if self._fh:
            self._fh.write(line + "\n")
            self._fh.flush()
        else:
            print(line)

    def close(self):
        if self._fh:
            self._fh.close()
