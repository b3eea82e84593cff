"""Jitted batched physics step (SURVEY.md §7 stage 7).

The host engine (physics/engine.py) is the bit-exact oracle: per-object
Python orchestration of slab collision, velocity transfer and sequential
friction/elasticity accumulation (reference ``data.py:495-560``). This
module compiles the SAME semantics into one jitted program over stacked
object state, so a scene tick is a single device dispatch instead of a
Python object loop — the TPU-first form that scales past a handful of
physical objects.

Exactness contract (tests/test_physics_jit.py):
* float64 on CPU, every float expression mirrors the host path (Chebyshev
  trunc direction, per-axis dump-on-block, <=1-unit moves, gravity /
  elasticity / friction damping / clamps, mover-order velocity transfer
  chains), and the friction/elasticity terms accumulate ONE AT A TIME in
  the host path's exact cell order (a lax.scan; masked cells add literal
  0.0, which is an exact float no-op) — so trajectories equal the host
  rollout bit-for-bit for scenes whose solidity rolls are deterministic.
* Solidity rolls: materials with solidity in {0, 1} (every default-scene
  material) need no randomness — the jitted step uses a constant 0.5 roll
  and matches the host stream exactly. Fractional solidity draws from a
  jax PRNG key instead of the host Mersenne stream: statistically the
  reference's behavior (data.py:537-539), not bit-equal — pass
  ``rolls_key`` to enable, or keep such scenes on the host path.

Static data (prop grids, sizes, weights) is rebuilt host-side by
``build_batch`` whenever sprites/rotations/frames change; the jitted step
only retraces when those static shapes change.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from python_raytracer_tpu.physics.engine import _dense_props


@dataclasses.dataclass(frozen=True)
class _Static:
    """Hashable per-batch static config (jit static arg)."""

    sizes: Tuple[Tuple[int, int, int], ...]  # object half-sizes
    movers: Tuple[int, ...]  # indices that run update_physics, in order
    wins: Tuple[int, ...]  # per-mover window extents (2*max(size)+5)
    pads: Tuple[int, ...]  # per-object grid margin
    gravity: float
    friction: float
    friction_air: float
    max_velocity: float
    min_velocity: float


@dataclasses.dataclass
class PhysicsBatch:
    """Stacked physics state + static prop grids for the jitted step."""

    static: _Static
    grids: list  # per-object padded (X, Y, Z, 3) prop grids, f64
    offs: np.ndarray  # [O, 3] dense-grid content offset (engine._dense_props)
    order: list  # object ids in scene order
    dtype: object = jnp.float64


def build_batch(scene, dtype=None) -> PhysicsBatch:
    """Host-side prep: dense prop grids (padded for window slicing), mover
    list and static settings. Rebuild on sprite/rotation/frame changes.
    Default dtype: f64 when x64 is enabled (the bit-exact oracle contract),
    else f32 (TPU — trajectories are then float32, statistically the
    reference's behavior)."""
    if dtype is None:
        dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    st = scene.settings
    objs = list(scene.objects.values())
    sizes = tuple(tuple(o.size) for o in objs)
    movers = tuple(i for i, o in enumerate(objs) if o.physics)
    wins = tuple(2 * max(objs[m].size) + 5 for m in movers)
    margin = max(wins) if wins else 0
    grids, offs, pads = [], [], []
    for o in objs:
        if o.sprite is not None:
            dense, off = _dense_props(o)
        else:
            dense, off = np.zeros((1, 1, 1, 3)), (0, 0, 0)
        g = np.zeros(tuple(s + 2 * margin for s in dense.shape[:3]) + (3,))
        g[margin:margin + dense.shape[0], margin:margin + dense.shape[1],
          margin:margin + dense.shape[2]] = dense
        grids.append(jnp.asarray(g, dtype))
        offs.append(off)
        pads.append(margin)
    return PhysicsBatch(
        static=_Static(sizes=sizes, movers=movers, wins=wins,
                       pads=tuple(pads), gravity=float(st.gravity),
                       friction=float(st.friction),
                       friction_air=float(st.friction_air),
                       max_velocity=float(st.max_velocity),
                       min_velocity=float(st.min_velocity)),
        grids=grids, offs=np.asarray(offs, np.int64), order=[o.id for o in objs],
        dtype=dtype)


def _bounds(pos, size):
    """Integer AABB exactly like Object._update_bounds: ceil(pos)-size,
    floor(pos)+size."""
    cp = jnp.ceil(pos)
    fp = jnp.floor(pos)
    s = jnp.asarray(size, pos.dtype)
    return cp - s, fp + s


def _step_impl(static: _Static, grids, offs, exact_sums, pos, vel, weights,
               visible, active, rolls_key):
    """One physics tick: every mover's update_physics in scene order.

    ``visible`` gates collider participation (Object.update visibility);
    ``active`` gates the mover itself (visible AND dist <= dist_move —
    the reference's movement-distance gate, scene/object.py update()).

    ``exact_sums``: accumulate friction/elasticity terms ONE AT A TIME in
    the host path's exact cell order (lax.scan) — the f64 bit-exactness
    contract. On TPU/f32 this scan is catastrophic (a sequential scalar
    loop over window-cells x objects x velocity-steps; the worker watchdog
    kills it), and f32 trajectories differ from the oracle anyway, so the
    f32 path uses vectorized jnp.sum (same terms, reordered rounding)."""
    dtype = pos.dtype
    O = pos.shape[0]
    one = jnp.asarray(1.0, dtype)

    def roll_grid(key, shape):
        if rolls_key is None:
            return jnp.full(shape, 0.5, dtype)
        return jax.random.uniform(key, shape, dtype)

    for mi, m in enumerate(static.movers):
        E = static.wins[mi]
        size_m = static.sizes[m]
        cells = E * E * E
        # window cell offsets, C-order = the host slab's x,y,z raster order
        cw = jnp.stack(jnp.meshgrid(jnp.arange(E), jnp.arange(E),
                                    jnp.arange(E), indexing="ij"),
                       axis=-1).reshape(cells, 3)

        def body(carry, m=m, mi=mi, E=E, size_m=size_m, cells=cells, cw=cw):
            va, pos_a, vel_a, fr, el, it = carry
            p_m = pos_a[m]
            mins_m, maxs_m = _bounds(p_m, size_m)
            ref = jnp.max(jnp.abs(va))
            refs = jnp.where(ref != 0, ref, one)
            vdir = jnp.trunc(va / refs)  # Chebyshev direction (+-1 dominant)
            # slab box, -X,+X,-Y,+Y,-Z,+Z precedence (engine.py post6)
            cases_lo = jnp.stack([
                mins_m.at[0].add(-1), mins_m.at[0].set(maxs_m[0]),
                mins_m.at[1].add(-1), mins_m.at[1].set(maxs_m[1]),
                mins_m.at[2].add(-1), mins_m.at[2].set(maxs_m[2])])
            cases_hi = jnp.stack([
                maxs_m.at[0].set(mins_m[0]), maxs_m.at[0].add(1),
                maxs_m.at[1].set(mins_m[1]), maxs_m.at[1].add(1),
                maxs_m.at[2].set(mins_m[2]), maxs_m.at[2].add(1)])
            case = jnp.where(
                vdir[0] < 0, 0, jnp.where(
                    vdir[0] > 0, 1, jnp.where(
                        vdir[1] < 0, 2, jnp.where(
                            vdir[1] > 0, 3, jnp.where(vdir[2] < 0, 4, 5)))))
            lo = cases_lo[case]
            hi = cases_hi[case]

            wo = mins_m - 2.0  # window origin covers post6 and post6-vdir
            wcells = wo[None, :] + cw.astype(dtype)  # [cells, 3] world
            in_box = jnp.all((wcells >= lo[None, :])
                             & (wcells <= hi[None, :]), axis=1)

            # self props one cell behind the slab (engine.py self_post6)
            pad_m = static.pads[m]
            sl0 = (wo - vdir - (mins_m - 0)
                   ).astype(jnp.int32) - jnp.asarray(offs[m], jnp.int32) \
                + jnp.int32(pad_m)
            self_win = jax.lax.dynamic_slice(
                grids[m], (sl0[0], sl0[1], sl0[2], jnp.int32(0)),
                (E, E, E, 3)).reshape(cells, 3)

            blocked = jnp.asarray(False)
            for j in range(O):
                if j == m:
                    continue
                mins_j, maxs_j = _bounds(pos_a[j], static.sizes[j])
                inter = (visible[j]
                         & jnp.all(lo <= maxs_j) & jnp.all(hi >= mins_j))
                # velocity transfer first (physical objects only,
                # engine.py data.py:523-527 chain order)
                if static.movers and j in static.movers:
                    amax = jnp.max(jnp.abs(va))
                    fac = jnp.clip(amax * weights[m] - weights[j], 0.0, 1.0)
                    transfer = jnp.where(inter, va * fac, jnp.zeros_like(va))
                    vel_a = vel_a.at[j].add(transfer)
                    vel_a = vel_a.at[m].add(-transfer)
                    va = va - transfer
                # slab solidity test over the window
                pad_j = static.pads[j]
                jl0 = (wo - mins_j).astype(jnp.int32) \
                    - jnp.asarray(offs[j], jnp.int32) + jnp.int32(pad_j)
                jwin = jax.lax.dynamic_slice(
                    grids[j], (jl0[0], jl0[1], jl0[2], jnp.int32(0)),
                    (E, E, E, 3)).reshape(cells, 3)
                key_j = (jax.random.fold_in(rolls_key, it * O + j)
                         if rolls_key is not None else None)
                r1 = roll_grid(key_j, (cells,))
                r2 = (roll_grid(jax.random.fold_in(key_j, 1), (cells,))
                      if rolls_key is not None else r1)
                pass_o = in_box & (jwin[:, 0] > r1)
                contact = pass_o & (self_win[:, 0] > r2) & inter
                any_c = jnp.any(contact)
                blocked = blocked | any_c
                # sequential accumulation in the host's exact cell order:
                # masked cells add 0.0 (an exact no-op), so the partial-sum
                # rounding chain equals engine.py's term-by-term loop
                ff = jnp.where(contact,
                               jwin[:, 1] * self_win[:, 1] * static.friction,
                               jnp.zeros((cells,), dtype))
                ee = jnp.where(contact,
                               jwin[:, 2] * self_win[:, 2] * static.friction,
                               jnp.zeros((cells,), dtype))

                if exact_sums:
                    def add_seq(c, t):
                        return (c[0] + t[0], c[1] + t[1]), None

                    (fr, el), _ = jax.lax.scan(add_seq, (fr, el), (ff, ee))
                else:
                    fr = fr + jnp.sum(ff)
                    el = el + jnp.sum(ee)

            step = jnp.where(blocked, vdir * jnp.abs(va),
                             vdir * jnp.minimum(jnp.abs(va), one))
            va = va - step
            pos_a = pos_a.at[m].add(jnp.where(blocked, 0.0, step))
            return va, pos_a, vel_a, fr, el, it + 1

        def cond(carry):
            va = carry[0]
            it = carry[5]
            # iteration cap: |va| drains to exact zero in theory (unit
            # Chebyshev steps, exact f.p. subtraction), but a runaway loop
            # inside jit kills the TPU worker process — bound it far above
            # any real velocity (max_velocity clamps between ticks)
            return jnp.any(va != 0.0) & (it < 4096)

        carry = (pos, vel)

        def run_mover(pos_vel):
            pos_a, vel_a = pos_vel
            va, pos_a, vel_a, fr, el, _ = jax.lax.while_loop(
                cond, lambda c: body(c),
                (vel_a[m], pos_a, vel_a, jnp.asarray(0.0, dtype),
                 jnp.asarray(0.0, dtype), jnp.int32(0)))
            # global velocity effects (engine.py / reference data.py:551-560)
            v = vel_a[m]
            v = v.at[1].add(-(weights[m] * static.gravity))
            v = v - v * el
            damp = 1.0 + jnp.maximum(0.0, fr + static.friction_air)
            v = v / damp
            v = jnp.clip(v, -static.max_velocity, static.max_velocity)
            v = jnp.where(jnp.abs(v) < static.min_velocity, 0.0, v)
            return pos_a, vel_a.at[m].set(v)

        pos, vel = jax.lax.cond(active[m], run_mover,
                                lambda pv: pv, carry)
    return pos, vel


def make_physics_step(batch: PhysicsBatch):
    """Jitted tick: (pos [O,3], vel [O,3], weights [O], visible [O] bool,
    active [O] bool, rolls_key or None) -> (pos, vel). Retraces only when
    batch statics change. f64 batches keep the bit-exact sequential sums;
    f32 uses vectorized sums (see _step_impl)."""
    fn = partial(_step_impl, batch.static, batch.grids,
                 jnp.asarray(batch.offs, jnp.int32),
                 batch.dtype == jnp.float64)
    return jax.jit(fn)


def step_scene(scene, batch: Optional[PhysicsBatch] = None, step_fn=None,
               rolls_key=None, device: Optional[str] = None):
    """Convenience host wrapper: one jitted physics tick for ``scene``,
    syncing object pos/vel back into the Python objects. Returns (batch,
    step_fn) for reuse. Anim/visibility/weight bookkeeping stays host-side
    (Object.update), exactly like the host path's call order.

    ``device``: None (auto) runs the physics jit on the CPU backend when
    the default backend is an accelerator — the tick is a handful of small
    sequential slab tests per mover (scalar-core-shaped work), and over
    the axon tunnel each tick would additionally pay ~7 host<->device
    transfers; host-local CPU jit measured ~1 ms vs ~700 ms on the
    tunneled TPU. Pass "default" to keep the default backend (e.g. a
    future many-object scene on a local accelerator)."""
    import math as _math

    if device is None:
        device = "cpu" if jax.default_backend() != "cpu" else "default"
    cpu_dev = jax.devices("cpu")[0] if device == "cpu" else None

    import contextlib
    ctx = (jax.default_device(cpu_dev) if cpu_dev is not None
           else contextlib.nullcontext())
    with ctx:
        if (batch is None
                or batch.order != [o.id for o in scene.objects.values()]
                or (cpu_dev is not None
                    and cpu_dev not in batch.grids[0].devices())):
            batch = build_batch(scene)
            step_fn = None
        if step_fn is None:
            step_fn = make_physics_step(batch)

        st = scene.settings
        cam = scene.player.cam_pos if scene.player is not None else (0.0,) * 3
        objs = [scene.objects[i] for i in batch.order]
        pos = jnp.asarray(np.array([o.pos for o in objs]), batch.dtype)
        vel = jnp.asarray(np.array([o.vel for o in objs]), batch.dtype)
        weights = jnp.asarray(np.array([o.weight for o in objs]), batch.dtype)
        visible = jnp.asarray(np.array([bool(o.visible) for o in objs]))
        active = jnp.asarray(np.array([
            bool(o.visible) and _math.dist(o.pos, cam) <= st.dist_move
            for o in objs]))
        pos, vel = step_fn(pos, vel, weights, visible, active, rolls_key)
    pos = np.asarray(pos)
    vel = np.asarray(vel)
    for i, o in enumerate(objs):
        if o.physics:
            o.move(tuple(float(x) for x in pos[i]))
        o.vel = tuple(float(x) for x in vel[i])
    return batch, step_fn
