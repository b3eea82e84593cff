"""Fused Pallas hit-replay: the production backward for the march.

The XLA replay backward (ops/diff.py ``_replay`` + jax.grad) is HBM-bound:
each of the H scan steps round-trips the [N]-wide carry and a materialized
[N, K] one-hot through HBM, and the rematerialized VJP pays it three times
(fwd + recompute + transpose) — measured 5.64 ms at N=393k/H=12 on v5e, a
69.8 Mrays/s fwd+bwd ceiling all by itself (ROADMAP.md roofline).

This module runs the same replay lane-major inside one Pallas kernel per
direction: rays on lanes ([rows, N] blocks, exactly the layout of
ops/blockmarch.py), the whole H-hit chain unrolled with every carry kept in
VMEM/registers, material rows fetched by transposed one-hot MXU dots from a
[8, Kpad] param plane staged in VMEM. The backward kernel *derives its own
transpose*: it calls ``jax.vjp`` over the unrolled replay inside the kernel
body, so the differentiated math is definitionally the same expression
graph as the forward — no hand-maintained adjoint to drift out of lockstep.
Gradients accumulate into an [8, Kpad] plane across the (sequential) grid
and unpack to the table layout outside; the per-hit float expressions
mirror ops/diff.py ``_replay`` term for term (reference semantics:
``lib.py:448-476``), so grads match the XLA replay to reordering of the
lane-sum (tests/test_replay_block.py).

Scope (callers fall back to ``_replay`` otherwise — ops/diff.py picks
automatically): single-program PBR scenes, f32, no per-voxel albedo grid,
no registered custom ray properties. That is exactly the production bench
configuration; everything else keeps the general XLA path.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from python_raytracer_tpu.config import Settings
from python_raytracer_tpu.ops import programs as P
from python_raytracer_tpu.ops.march import HitRecords
from python_raytracer_tpu.scene import material as M


def _pad_to(x, mult):
    return -(-x // mult) * mult


def replay_block_supported(programs_used=(M.PROGRAM_PBR,), voxel_albedo=None,
                           dtype=jnp.float32) -> bool:
    """True when the fused kernel serves this replay configuration."""
    return (tuple(programs_used) == (M.PROGRAM_PBR,)
            and voxel_albedo is None
            and not P.ray_properties()
            and dtype == jnp.float32)


def _make_kernel(settings: Settings, *, h: int, hp: int, kp: int, w: int,
                 grad: bool):
    """Kernel body for one direction. ``grad=False``: replay the H-hit chain
    and write the final (color, energy, vel, bounces) rows. ``grad=True``:
    jax.vjp the same chain against the incoming cotangent rows and
    accumulate the [8, kp] material-plane gradient across grid steps."""
    falloff_e = 1.0 + float(settings.falloff)

    def kernel(vid_ref, u_ref, flip_ref, cnt_ref, v0_ref, *rest):
        if grad:
            g_ref, tab_ref, dplane_ref = rest
        else:
            tab_ref, out_ref = rest
        count = cnt_ref[0]
        rows_iota = jax.lax.broadcasted_iota(jnp.int32, (kp, w), 0)

        def replay(tab):
            # mirrors ops/diff.py _replay hit_step on the single-program PBR
            # path (reference lib.py:448-460 shading + init.py:88-111 flips),
            # lane-major: one [8,kp]@[kp,w] one-hot dot per hit, carries in
            # registers. Term-for-term float identity with _replay is load-
            # bearing: gradients must match the XLA replay.
            zero = jnp.zeros((w,), jnp.float32)
            cr, cg, cb, en, bo = zero, zero, zero, zero, zero
            vx, vy, vz = v0_ref[0], v0_ref[1], v0_ref[2]
            for i in range(h):
                live = count > i
                vid = vid_ref[i]
                oh = (rows_iota == vid[None, :]).astype(jnp.float32)
                mrows = jnp.dot(tab, oh,
                                preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.HIGHEST)
                alb_r, alb_g, alb_b = mrows[0], mrows[1], mrows[2]
                rough, absorb = mrows[3], mrows[4]
                ior, men = mrows[5], mrows[6]
                absb = jnp.minimum(
                    1.0, absorb / (1.0 + bo) ** falloff_e)
                ncr = cr * (1 - absb) + alb_r * absb
                ncg = cg * (1 - absb) + alb_g * absb
                ncb = cb * (1 - absb) + alb_b * absb
                nen = en * (1 - absb) + men * absb
                u0 = u_ref[i]
                u1 = u_ref[hp + i]
                u2 = u_ref[2 * hp + i]
                nvx = vx + (-1.0 + u0 * 2.0) * rough
                nvy = vy + (-1.0 + u1 * 2.0) * rough
                nvz = vz + (-1.0 + u2 * 2.0) * rough
                # Chebyshev renormalize (utils/mathutils.cheb_normalize)
                ref = jnp.maximum(jnp.maximum(jnp.abs(nvx), jnp.abs(nvy)),
                                  jnp.abs(nvz))
                nz = ref != 0
                refs = jnp.where(nz, ref, 1.0)
                nvx = jnp.where(nz, nvx / refs, nvx)
                nvy = jnp.where(nz, nvy / refs, nvy)
                nvz = jnp.where(nz, nvz / refs, nvz)
                flip = flip_ref[i]
                nvx = jnp.where((flip & 1) > 0, nvx - nvx * ior * 2.0, nvx)
                nvy = jnp.where((flip & 2) > 0, nvy - nvy * ior * 2.0, nvy)
                nvz = jnp.where((flip & 4) > 0, nvz - nvz * ior * 2.0, nvz)
                nbo = bo + absorb
                cr = jnp.where(live, ncr, cr)
                cg = jnp.where(live, ncg, cg)
                cb = jnp.where(live, ncb, cb)
                en = jnp.where(live, nen, en)
                vx = jnp.where(live, nvx, vx)
                vy = jnp.where(live, nvy, vy)
                vz = jnp.where(live, nvz, vz)
                bo = jnp.where(live, nbo, bo)
            return (cr, cg, cb, en, vx, vy, vz, bo)

        if grad:
            _, vjp = jax.vjp(replay, tab_ref[:])
            (dtab,) = vjp(tuple(g_ref[i] for i in range(8)))
            t = pl.program_id(0)

            @pl.when(t == 0)
            def _():
                dplane_ref[:] = jnp.zeros((8, kp), jnp.float32)

            dplane_ref[:] = dplane_ref[:] + dtab
        else:
            outs = replay(tab_ref[:])
            for i, o in enumerate(outs):
                out_ref[i] = o

    return kernel


def _pack_inputs(records: HitRecords, v0, n, npad, h, hp):
    vidT = jnp.zeros((hp, npad), jnp.int32).at[:h, :n].set(
        jnp.moveaxis(records.vid, 1, 0))
    uT = jnp.zeros((3 * hp, npad), jnp.float32)
    u = jnp.moveaxis(records.u.astype(jnp.float32), 1, 0)  # [h, n, 3]
    for j in range(3):
        uT = uT.at[j * hp : j * hp + h, :n].set(u[..., j])
    flipT = jnp.zeros((hp, npad), jnp.int32).at[:h, :n].set(
        jnp.moveaxis(records.flip, 1, 0))
    cnt = jnp.zeros((8, npad), jnp.int32).at[0, :n].set(
        records.count.astype(jnp.int32))
    v0T = jnp.zeros((8, npad), jnp.float32).at[:3, :n].set(
        v0.astype(jnp.float32).T)
    return vidT, uT, flipT, cnt, v0T


def make_replay_block(settings: Settings, background: Optional[str] = "sky",
                      *, tile: int = 2048, interpret: Optional[bool] = None):
    """Build ``replay(table, records, v0) -> (color [N,3], energy [N])`` —
    an ops/diff.py ``_replay`` drop-in (single-program PBR scope) whose
    forward AND backward are fused Pallas kernels. The background runs as
    plain XLA outside the custom_vjp core, so its gradient contribution is
    ordinary autodiff, exactly like ``_replay``."""
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    # static hit depth threads to _make_kernel through this cell (the jitted
    # caller fixes records.vid's shape, so one closure per trace is exact)
    _H = [0]

    @jax.custom_vjp
    def core(table, vidT, uT, flipT, cnt, v0T):
        return _run(table, vidT, uT, flipT, cnt, v0T, None)

    def _run(table, vidT, uT, flipT, cnt, v0T, g):
        hp, npad = vidT.shape
        w = npad if interpret else min(tile, npad)
        grad = g is not None
        k = table.shape[0]
        kp = _pad_to(k, 8)
        plane = jnp.zeros((8, kp), jnp.float32).at[:7, :k].set(
            table.astype(jnp.float32).T[:7])
        kernel = _make_kernel(settings, h=_H[0], hp=hp, kp=kp, w=w, grad=grad)
        state_spec = lambda rows: pl.BlockSpec(
            (rows, w), lambda t: (0, t), memory_space=pltpu.VMEM)
        plane_spec = pl.BlockSpec((8, kp), lambda t: (0, 0),
                                  memory_space=pltpu.VMEM)
        in_specs = [state_spec(hp), state_spec(3 * hp), state_spec(hp),
                    state_spec(8), state_spec(8)]
        args = [vidT, uT, flipT, cnt, v0T]
        if grad:
            in_specs.append(state_spec(8))
            args.append(g)
            out_spec = plane_spec
            out_shape = jax.ShapeDtypeStruct((8, kp), jnp.float32)
        else:
            out_spec = state_spec(8)
            out_shape = jax.ShapeDtypeStruct((8, npad), jnp.float32)
        in_specs.append(plane_spec)
        args.append(plane)
        return pl.pallas_call(
            kernel,
            grid=(npad // w,),
            in_specs=in_specs,
            out_specs=out_spec,
            out_shape=out_shape,
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 2 ** 20) if not interpret else None,
        )(*args)

    def core_fwd(table, vidT, uT, flipT, cnt, v0T):
        out = core(table, vidT, uT, flipT, cnt, v0T)
        return out, (table, vidT, uT, flipT, cnt, v0T)

    def core_bwd(res, g):
        table, vidT, uT, flipT, cnt, v0T = res
        dplane = _run(table, vidT, uT, flipT, cnt, v0T, g)
        k, p = table.shape
        dtable = jnp.zeros((k, p), table.dtype).at[:, :7].set(
            dplane[:7, :k].T)
        return dtable, None, None, None, None, None

    core.defvjp(core_fwd, core_bwd)

    def replay(table, records: HitRecords, v0):
        n, h = records.vid.shape
        _H[0] = h
        hp = _pad_to(h, 8)
        if interpret:
            # single-tile in interpret mode: XLA:CPU compile time explodes
            # on the multi-tile grid of the unrolled chain (measured: grid=2
            # x H=12 never finishes; grid=1 x H=12 is ~5 s). Tests only —
            # the Mosaic path keeps the real grid.
            w = _pad_to(n, 256)
        else:
            w = min(tile, _pad_to(n, 256))
        npad = _pad_to(n, w)
        packed = _pack_inputs(records, v0, n, npad, h, hp)
        out = core(table, *packed)
        color = out[0:3, :n].T
        energy = out[3, :n]
        vel = out[4:7, :n].T
        bounces = out[7, :n]
        bg = P.resolve_background(background)
        if bg is not None:
            color, energy = bg(color, energy, vel, bounces, settings)
            color = jnp.minimum(255.0, color * energy[:, None])
        return color, energy

    return replay
