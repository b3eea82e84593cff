"""Runtime engine: the frame-loop orchestrator (the reference's Window).

Re-designs ``Window`` (reference ``init.py:153-474``) TPU-first. Where the
reference re-pickles the camera + chunk dict to a process pool every frame
(init.py:205), here the scene lives on device and the per-frame work is:

* render dispatch — one jitted while-march over all pixels; JAX's async
  dispatch gives the same 2-stage overlap as the reference's worker pipeline
  (workers trace frame N while the main thread composites N-1,
  init.py:193-205) without any transport;
* shutter motion-blur accumulation onto the persistent canvas
  (alpha_over, init.py:185-190) and the post stack (init.py:208-253);
* chunk scheduling at chunk_rate — world-grid rebuild for redrawn objects
  (init.py:398-446) + device-side LOD/culling bake fed by the traversed-
  chunk mask from the previous frame (init.py:447-452, the occlusion
  culling feedback loop);
* per-object updates: visibility, animation, physics, custom functions
  (init.py:469-470 -> data.py:564-587);
* input-driven player impulses (init.py:353-385) and iris state integration
  (init.py:463).
"""

from __future__ import annotations

import dataclasses
import math
import time as _time
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from python_raytracer_tpu.config import Settings
from python_raytracer_tpu.ops import post as post_ops
from python_raytracer_tpu.ops.render import render_frame
from python_raytracer_tpu.scene.compile import (
    CompiledScene,
    bake_chunks,
    build_world_ids,
    compile_scene,
)
from python_raytracer_tpu.scene.scene import Scene
from python_raytracer_tpu.utils.metrics import MetricLog, trace_scope
from python_raytracer_tpu.utils.hostmath import (
    euler_to_quat_h,
    quat_vec_forward_h,
    quat_vec_right_h,
    quat_vec_up_h,
)


def _mix(a, b, bias):
    return a * (1 - bias) + b * bias


class Engine:
    """Owns the compiled scene and advances it frame by frame."""

    def __init__(self, scene: Scene, margin_chunks: int = 2, dtype=jnp.float32,
                 key: Optional[jax.Array] = None, pipeline: Optional[bool] = None,
                 compact: bool = False, metrics: Optional[MetricLog] = None,
                 metrics_every: int = 0, block: bool = False,
                 block_kw: Optional[dict] = None, jit_physics: bool = False,
                 host_scale: bool = False):
        self.scene = scene
        self.settings: Settings = scene.settings
        st = self.settings
        # jit_physics: run every mover's physics tick as ONE jitted device
        # dispatch (physics/jit_engine.py) instead of the host per-object
        # loop (SURVEY.md §7 stage 7). Opt-in; the host engine remains the
        # bit-exact oracle. Custom object functions run before the batched
        # step instead of interleaved per object — scenes whose functions
        # read post-physics state of earlier objects should keep the host
        # path.
        self.jit_physics = jit_physics
        self._phys_batch = None
        self._phys_fn = None
        # Observability (SURVEY.md §5.1/5.5, replacing the reference's FPS
        # HUD init.py:256-259): per-phase wall times every frame
        # (self.last_phase_ms), march stats + a JSON-lines metric record
        # every ``metrics_every`` frames when a MetricLog is attached.
        self.metrics = metrics
        self.metrics_every = metrics_every if metrics is not None else 0
        self.last_phase_ms: dict = {}
        self.last_stats: Optional[dict] = None

        cam0 = scene.player.cam_pos if scene.player else (0.0, 0.0, 0.0)
        self.compiled: CompiledScene = compile_scene(
            scene, margin_chunks=margin_chunks, cam_pos=cam0
        )
        # With culling on, the reference starts with no chunks assigned and
        # populates them from ray feedback (init.py:447); mirror that.
        self._traversed = (
            jnp.zeros(self.compiled.spec.chunk_shape, bool)
            if st.culling
            else jnp.ones(self.compiled.spec.chunk_shape, bool)
        )
        self._world_dev = self.compiled.arrays.world_ids
        self._key = key if key is not None else jax.random.PRNGKey(0)
        self.dtype = dtype

        self._bake = jax.jit(bake_chunks, static_argnums=(0, 1))
        # Static mode: the reference reseeds noise per pixel each frame
        # (init.py:136-137) so the pattern is frame-stable; we replay the
        # identical Mersenne-Twister tape every frame (utils/tape.py).
        self._static_tape = None
        if st.static:
            from python_raytracer_tpu.utils.tape import make_static_tape

            self._static_tape = jnp.asarray(make_static_tape(st), dtype)
        if compact:
            # Host-orchestrated ray-compacted render (ops/compact.py):
            # bit-identical, lower wall time when ray lifetimes diverge.
            from python_raytracer_tpu.ops.render import render_frame_compacted

            self._render = lambda arrays, cam_pos, cam_rot, lens, key: (
                render_frame_compacted(
                    st, self.compiled.spec, arrays, cam_pos, cam_rot, lens,
                    key=key, tape=self._static_tape,
                    background=self.compiled.background or "sky",
                    record_traversed=True, dtype=dtype,
                    programs_used=self.compiled.programs_used,
                )
            )
        else:
            # block=True renders through the Pallas kernel
            # (ops/blockmarch.py; TPU f32 — static configs march in-kernel
            # with per-ray VMEM-staged tape segments)
            if block and dtype != jnp.float32:
                raise ValueError("block rendering needs f32")
            if block and block_kw and block_kw.get("resident"):
                # resident pool under the jitted frame renderer: the scene
                # arrays are traced (rebakes swap them), so the pool needs a
                # static capacity; default to the current occupancy plus
                # headroom (overflow chunks march in the cleanup pass)
                block_kw = dict(block_kw)
                if block_kw.get("resident_cap", 0) <= 0:
                    occ0 = int(np.asarray(
                        jax.device_get(self.compiled.arrays.chunk_res) > 0
                    ).sum())
                    block_kw["resident_cap"] = max(8, occ0 + (occ0 >> 2))
                self._resident_cap = block_kw["resident_cap"]
            self._render = jax.jit(
                lambda arrays, cam_pos, cam_rot, lens, key: render_frame(
                    st, self.compiled.spec, arrays, cam_pos, cam_rot, lens,
                    key=key, tape=self._static_tape,
                    background=self.compiled.background or "sky",
                    mode="block" if block else "while",
                    record_traversed=True, dtype=dtype,
                    programs_used=self.compiled.programs_used,
                    with_stats=self.metrics_every > 0,
                    block_kw=block_kw,
                )
            )
        # Post pipeline as ONE jitted program: eager per-op dispatch is fine
        # on CPU but pays per-op RPC latency over the axon tunnel (measured
        # seconds/frame while the compute is ~2 ms) — same reason the
        # renderer is jitted above.
        # ``host_scale``: skip the device-side window scale and return the
        # small pre-scale frame — the display edge scales on the host,
        # exactly where the reference scales (pygame, init.py:245-253).
        # Cuts the per-frame readback from window_scaled (e.g. 1024x768x4
        # floats = 12.6 MB, ~390 ms over the axon tunnel) to the render
        # resolution (~50 KB). Goldens keep the default device scale.
        self.host_scale = host_scale

        def _post(canvas, frame, iris):
            canvas = post_ops.alpha_over(canvas, frame)
            image, iris_t = post_ops.post_stack(
                canvas, st, iris, scale_to_window=not host_scale)
            return canvas, image, iris_t

        self._post_jit = jax.jit(_post)

        if st.culling and scene.player is not None:
            self._rebake()

        # Runtime state (reference Window.__init__, init.py:163-173)
        self.canvas = jnp.zeros((st.height, st.width, 4), dtype)
        self.iris = 0.0
        self.iris_target = 0.0
        self.timer = 0.0
        self.ticks_ms = 0.0
        self.lens = st.lens  # mutable via mouse wheel (init.py:282)
        self.frame_index = 0
        self._baked_object_ids = set(scene.objects.keys())
        # Frame pipelining: with sync=false the reference overlaps worker
        # tracing of frame N with compositing frame N-1 (init.py:193-205).
        # Here the same 2-stage pipeline is: dispatch render N (async on
        # device), hand back the host copy of N-1. sync=true (reference
        # barrier mode) renders and returns the same frame.
        self.pipeline = (not st.sync) if pipeline is None else pipeline
        self._pending = None  # (device image, device traversed)

    # --- camera ---

    @property
    def cam_pos(self) -> np.ndarray:
        return np.array(self.scene.player.cam_pos, np.float64)

    @property
    def cam_rot(self) -> np.ndarray:
        return np.array(self.scene.player.cam_rot, np.float64)

    # --- chunk scheduling (reference init.py:389-452) ---

    def _rebake(self):
        arrays = self.compiled.arrays
        baked, chunk_res, cell_word = self._bake(
            self.compiled.spec, self.settings, self._world_dev,
            jnp.asarray(self.cam_pos, jnp.float32), self._traversed,
            arrays.mat_bits,
        )
        self.compiled.arrays = dataclasses.replace(
            arrays, world_ids=self._world_dev, baked_ids=baked,
            chunk_res=chunk_res, cell_word=cell_word,
        )
        # resident-pool overflow signal (ADVICE r4): occupancy past the
        # static resident_cap silently pushes chunks to the per-frame XLA
        # cleanup march — correct but a quiet performance cliff, so count
        # overflow ranks and surface them. One scalar readback per rebake
        # (chunk-cadence, not per frame).
        cap = getattr(self, "_resident_cap", 0)
        if cap:
            occ = int(jax.device_get(jnp.sum(chunk_res > 0)))
            if occ > cap:
                over = occ - cap
                if self.metrics is not None:
                    self.metrics.log("resident_overflow", occupied=occ,
                                     cap=cap, overflow=over)
                else:
                    print(f"[engine] resident pool overflow: {occ} occupied "
                          f"chunks > cap {cap} ({over} to cleanup march)")

    def refresh_materials(self):
        """Re-read edited Material objects into the device table.

        The reference shares materials by reference, so editing one retints
        every voxel using it on the next frame (README.md:77); here the
        authored values live in a compiled table, so edits are pushed
        explicitly. Edits that change the DISCRETE per-material bits —
        IOR equality classes (init.py:106 compares IORs for equality) or
        the roughness-draw flag — are detected and trigger an automatic
        re-bake: the bits are inputs of bake_chunks, so the cell words
        refresh without any jit recompilation (scene/material.py)."""
        reg = self.compiled.registry
        self.compiled.arrays = dataclasses.replace(
            self.compiled.arrays,
            material_table=jnp.asarray(reg.table()),
        )
        flags = reg.flags()
        mat_bits = jnp.asarray(flags["ior_class"] | (flags["has_roughness"] << 4))
        if not bool(jnp.array_equal(mat_bits, self.compiled.arrays.mat_bits)):
            self.compiled.arrays = dataclasses.replace(
                self.compiled.arrays,
                mat_bits=mat_bits,
                has_roughness=jnp.asarray(flags["has_roughness"]),
                has_ior=jnp.asarray(flags["has_ior"]),
                program=jnp.asarray(flags["program"]),
            )
            self._rebake()

    def chunk_update(self, dt: float):
        """Rebuild the world grid for redrawn objects and re-bake LOD/culling,
        rate-limited by chunk_time (reference init.py:389-392)."""
        st = self.settings
        self.timer += dt
        if self.timer < st.chunk_time:
            return
        self.timer -= max(st.chunk_time, dt)

        ids = set(self.scene.objects.keys())
        needs_world = ids != self._baked_object_ids or any(
            o.redraw for o in self.scene.objects.values()
        )
        if needs_world:
            for o in self.scene.objects.values():
                if o.redraw and o.visible:
                    o.redraw = False
            world = build_world_ids(
                self.scene, self.compiled.spec, self.compiled.registry, self.cam_pos
            )
            self._world_dev = jnp.asarray(world)
            self._baked_object_ids = ids
        self._rebake()

    # --- per-frame update (reference init.py:455-471) ---

    def step(self, dt: float) -> Optional[np.ndarray]:
        """Advance one frame; returns the displayed RGBA image (window-scaled,
        float 0..255) or None if no camera exists."""
        scene, st = self.scene, self.settings
        if not scene.player or not (scene.player.cam_vec[0] or scene.player.cam_vec[1]):
            print("Error: No camera object found, define at least one object with a camera in the scene.")
            return None

        self.ticks_ms += dt * 1000

        # Iris state integration (init.py:463)
        self.iris = _mix(self.iris, self.iris_target * st.iris, st.iris_time * dt)

        # Render + composite + post. In pipeline mode the device works on
        # frame N while the host receives N-1 (JAX async dispatch supplies
        # the overlap; block only on the *previous* frame's outputs).
        phase_t = {}
        t0 = _time.perf_counter()
        with trace_scope("engine/render"):
            self._key, sub = jax.random.split(self._key)
            out_r = self._render(
                self.compiled.arrays,
                jnp.asarray(self.cam_pos, self.dtype),
                jnp.asarray(self.cam_rot, self.dtype),
                self.lens, sub,
            )
            frame, traversed = out_r[0], out_r[1]
            stats_dev = out_r[2] if len(out_r) > 2 else None
            self._traversed = traversed
            self.last_frame = frame  # raw pre-post frame (goldens/debug)
        phase_t["render"] = _time.perf_counter() - t0

        t0 = _time.perf_counter()
        with trace_scope("engine/post"):
            self.canvas, image_dev, iris_target = self._post_jit(
                self.canvas, frame, jnp.asarray(self.iris, self.dtype))
            if self.pipeline:
                out = self._pending
                self._pending = (image_dev, iris_target)
                if out is None:
                    image, iris_target_host = image_dev, iris_target  # first frame
                else:
                    image, iris_target_host = out
            else:
                image, iris_target_host = image_dev, iris_target
            if st.iris and st.iris_time:
                self.iris_target = float(iris_target_host)
        phase_t["post"] = _time.perf_counter() - t0

        t0 = _time.perf_counter()
        with trace_scope("engine/chunk"):
            self.chunk_update(dt)
        phase_t["chunk"] = _time.perf_counter() - t0

        # Object updates: visibility, animation, physics, custom function
        # (init.py:469-470)
        t0 = _time.perf_counter()
        with trace_scope("engine/objects"):
            if self.jit_physics:
                for obj in list(scene.objects.values()):
                    obj.update(self.cam_pos, self.ticks_ms,
                               skip_physics=True)
                from python_raytracer_tpu.physics.jit_engine import step_scene

                self._phys_batch, self._phys_fn = step_scene(
                    scene, self._phys_batch, self._phys_fn)
            else:
                for obj in list(scene.objects.values()):
                    obj.update(self.cam_pos, self.ticks_ms)
        phase_t["objects"] = _time.perf_counter() - t0

        t0 = _time.perf_counter()
        image = np.asarray(image)  # host sync point (display edge)
        phase_t["readback"] = _time.perf_counter() - t0
        self.last_phase_ms = {k: round(v * 1e3, 3) for k, v in phase_t.items()}

        if self.metrics_every and self.frame_index % self.metrics_every == 0:
            n_rays = st.width * st.height * st.samples
            total_s = max(1e-9, sum(phase_t.values()))
            self.last_stats = {
                "frame": self.frame_index,
                "mean_steps": float(stats_dev[0]) if stats_dev else None,
                "mean_bounces": float(stats_dev[1]) if stats_dev else None,
                "mrays_per_s": round(n_rays / total_s / 1e6, 4),
                **{f"{k}_ms": v for k, v in self.last_phase_ms.items()},
            }
            self.metrics.log("frame", **self.last_stats)

        self.frame_index += 1
        return image

    def run(self, frames: int, dt: Optional[float] = None) -> np.ndarray:
        """Headless run of N frames; returns the last displayed image."""
        st = self.settings
        dt = dt if dt is not None else (1.0 / st.fps if st.fps else 1 / 24)
        out = None
        for _ in range(frames):
            out = self.step(dt)
        return out

    # --- input-driven player impulses (reference init.py:353-385) ---

    def apply_input(self, input_vel, input_rot, mouse_rot, dt: float, sprint: bool = False):
        """Apply movement/rotation input to the player object.

        input_vel: (x, y, z) in {-1, 0, 1} strafe/jump/forward intents;
        input_rot: euler rotation intent; mouse_rot: (dx, dy) mouselook.
        """
        st = self.settings
        player = self.scene.player
        if any(input_vel):
            speed = 2 if sprint else 1
            rot_e = (0.0, player.rot[1], 0.0) if st.max_pitch else player.rot
            q = euler_to_quat_h(rot_e)
            if input_vel[0]:
                unit = st.speed_move * speed * dt
                d = quat_vec_right_h(q)
                amt = max(-1, min(1, input_vel[0])) * unit
                player.accelerate((d[0] * amt, d[1] * amt, d[2] * amt))
            if input_vel[1]:
                unit = st.speed_jump / (1 + dt)
                d = quat_vec_up_h(q)
                amt = max(-1, min(1, input_vel[1])) * unit
                player.accelerate((d[0] * amt, d[1] * amt, d[2] * amt))
            if input_vel[2]:
                unit = st.speed_move * speed * dt
                d = quat_vec_forward_h(q)
                amt = max(-1, min(1, input_vel[2])) * unit
                player.accelerate((d[0] * amt, d[1] * amt, d[2] * amt))

        if any(input_rot) or any(mouse_rot):
            unit_key = st.speed_move * dt
            unit_mouse = st.speed_mouse / (1 + dt * 1000)
            rot = tuple(
                ir * unit_key + mr * unit_mouse
                for ir, mr in zip(input_rot, (0.0, +mouse_rot[0], -mouse_rot[1]))
            )
            player.rotate(rot)
            rx, ry, rz = player.rot
            if st.max_roll:
                roll_min = max(180, 360 - st.max_roll)
                roll_max = min(180, st.max_roll)
                if rx > roll_max and rx <= 180:
                    rx = roll_max
                if rx < roll_min and rx > 180:
                    rx = roll_min
            if st.max_pitch:
                pitch_min = max(180, 360 - st.max_pitch)
                pitch_max = min(180, st.max_pitch)
                if rz > pitch_max and rz <= 180:
                    rz = pitch_max
                if rz < pitch_min and rz > 180:
                    rz = pitch_min
            player.rot = (rx, ry, rz)
