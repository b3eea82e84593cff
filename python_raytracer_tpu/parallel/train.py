"""Differentiable rendering + the sharded training step.

The north-star task (BASELINE.json): gradients of the rendered image w.r.t.
the material parameter table (albedo/roughness/absorption/ior/energy), with
rays data-parallel over the device mesh and the table gradient all-reduced
(psum) across shards — the TPU replacement for a capability the reference
has none of (it is a forward-only CPU renderer).

Differentiation strategy (SURVEY.md §7 "hard parts"):
* the march runs in ``scan`` mode (static trip count) so reverse-mode is
  well-defined;
* trajectories (which voxels get hit, termination) are discrete and receive
  no gradient — gradients flow through the color/energy/life arithmetic of
  the material programs (reference lib.py:456-459 algebra), matching the
  north-star's "grads w.r.t. material params on fixed trajectories";
* exact-mode integer rounding is disabled (settings.exact=False) for a
  smooth forward.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from python_raytracer_tpu.config import Settings
from python_raytracer_tpu.ops.march import RayBatch, march
from python_raytracer_tpu.scene.compile import GridSpec, SceneArrays


def render_colors(settings: Settings, spec: GridSpec, arrays: SceneArrays,
                  rays: RayBatch, key=None, background="sky") -> jnp.ndarray:
    """Differentiable forward: ray colors in [0, 255] floats ([N, 3])."""
    assert not settings.exact, "differentiable path needs settings.exact=False"
    res = march(settings, spec, arrays, rays, key=key, background=background, mode="scan")
    return res.color


def image_loss(table, settings, spec, arrays, rays, target, key=None):
    """Mean squared error in [0,1] color space w.r.t. the material table."""
    arr = dataclasses.replace(arrays, material_table=table)
    colors = render_colors(settings, spec, arr, rays, key=key)
    return jnp.mean((colors / 255.0 - target) ** 2)


def project_material_table(table):
    """Clamp the table to the physically-valid parameter domain.

    Keeps optimization inside the region where the shading math is defined:
    a negative absorption would make the bounce counter negative and the
    falloff power (1 + bounces) ** (1 + falloff) complex (reference
    lib.py:450 semantics assume non-negative bounce amounts)."""
    from python_raytracer_tpu.scene import material as M

    lo = jnp.zeros((M.NUM_PARAMS,))
    hi = jnp.array([255.0, 255.0, 255.0,  # albedo
                    1.0,                   # roughness
                    jnp.inf,               # absorption
                    1.0,                   # ior
                    jnp.inf,               # energy
                    1.0,                   # solidity
                    jnp.inf, jnp.inf, 1.0])  # weight, friction, elasticity
    return jnp.clip(table, lo[None, :], hi[None, :])


def make_train_step(settings: Settings, spec: GridSpec,
                    optimizer: optax.GradientTransformation,
                    mesh: Optional[Mesh] = None, max_hits: int = 16,
                    programs_used=(0,), project=None, grad_mask=None,
                    forward: str = "while", block_kw: Optional[dict] = None,
                    split: Optional[bool] = None):
    """Build a jitted train step. With a mesh, rays are sharded on the batch
    axis ('data') and everything else is replicated; jit inserts the psum for
    the table gradient.

    Uses the hit-tape custom VJP (ops/diff.py): early-exit forward march +
    hit-replay backward, verified gradient-identical to scan autodiff in
    tests/test_grad.py.

    ``forward="block"`` routes the forward through the Pallas blockwise
    kernel (ops/blockmarch.py). One fused jit(value_and_grad) over that
    program did not finish XLA-compiling in 45 min on TPU (ROADMAP round-2
    measurement), so block defaults to ``split=True``: the step runs as TWO
    jitted programs — kernel forward recording the hit tape, then
    replay-grad + optimizer update — dispatched back-to-back on the same
    stream (identical device work; the replay reproduces the forward color
    bit-exactly, so the loss and gradients equal the fused step's exactly,
    tests/test_train_split.py). ``split`` can be forced either way."""
    from python_raytracer_tpu.ops.diff import make_diff_renderer

    settings = settings.replace(exact=False)
    if split is None:
        split = forward == "block"
    if split:
        return _make_split_train_step(
            settings, spec, optimizer, mesh=mesh, max_hits=max_hits,
            programs_used=programs_used, project=project, grad_mask=grad_mask,
            forward=forward, block_kw=block_kw)
    renderer = make_diff_renderer(settings, spec, max_hits=max_hits,
                                  programs_used=programs_used,
                                  forward=forward, block_kw=block_kw)

    def step(arrays: SceneArrays, opt_state, rays: RayBatch, target, key):
        def loss_fn(table):
            color, _energy = renderer(table, arrays, rays, key)
            return jnp.mean((color / 255.0 - target) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(arrays.material_table)
        if grad_mask is not None:
            # Restrict optimization to chosen parameters: gradients are exact
            # only on fixed hit trajectories (BASELINE.json north star), so
            # trajectory-shaping parameters (absorption/ior/roughness) are
            # often better frozen or regularized by the caller.
            grads = grads * grad_mask
        updates, opt_state = optimizer.update(grads, opt_state, arrays.material_table)
        table = optax.apply_updates(arrays.material_table, updates)
        if project is not None:
            table = project(table)
        return dataclasses.replace(arrays, material_table=table), opt_state, loss

    if mesh is None:
        return jax.jit(step)

    shard = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    arrays_sh = SceneArrays(
        world_ids=repl, baked_ids=repl, chunk_res=repl, cell_word=repl,
        material_table=repl, has_roughness=repl, has_ior=repl, program=repl,
        mat_bits=repl,
    )
    in_shardings = (
        arrays_sh,
        repl,  # opt_state (small pytree, replicated)
        RayBatch(pos=shard, vel=shard, life=shard),
        shard,  # target colors [N, 3]
        repl,  # key
    )
    out_shardings = (arrays_sh, repl, repl)
    return jax.jit(step, in_shardings=in_shardings, out_shardings=out_shardings)


def _make_split_train_step(settings: Settings, spec: GridSpec,
                           optimizer: optax.GradientTransformation,
                           mesh: Optional[Mesh], max_hits: int,
                           programs_used, project, grad_mask,
                           forward: str, block_kw: Optional[dict]):
    """Two-program train step (see make_train_step): ``f_fwd`` marches and
    records the hit tape, ``f_bwd`` differentiates the tape replay and
    applies the optimizer. Compiles in minutes where the fused
    jit(value_and_grad) over the Pallas kernel did not finish in 45."""
    from python_raytracer_tpu.ops.diff import _replay

    background = "sky"

    def fwd(arrays: SceneArrays, rays: RayBatch, key):
        if forward == "block":
            from python_raytracer_tpu.ops.blockmarch import march_blockwise

            res = march_blockwise(settings, spec, arrays, rays, key=key,
                                  background=background,
                                  record_hits=max_hits,
                                  programs_used=programs_used,
                                  **(block_kw or {}))
        else:
            res = march(settings, spec, arrays, rays, key=key,
                        background=background, mode=forward,
                        record_hits=max_hits, programs_used=programs_used)
        return res.hits

    def bwd(arrays: SceneArrays, opt_state, hits, v0, target):
        def loss_fn(table):
            color, _ = _replay(table, settings, hits, v0, background,
                               programs_used, arrays.program)
            return jnp.mean((color / 255.0 - target) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(arrays.material_table)
        if grad_mask is not None:
            grads = grads * grad_mask
        updates, opt_state = optimizer.update(grads, opt_state,
                                              arrays.material_table)
        table = optax.apply_updates(arrays.material_table, updates)
        if project is not None:
            table = project(table)
        return dataclasses.replace(arrays, material_table=table), opt_state, loss

    if mesh is None:
        f_fwd = jax.jit(fwd)
        f_bwd = jax.jit(bwd)
    else:
        shard = NamedSharding(mesh, P("data"))
        repl = NamedSharding(mesh, P())
        arrays_sh = SceneArrays(
            world_ids=repl, baked_ids=repl, chunk_res=repl, cell_word=repl,
            material_table=repl, has_roughness=repl, has_ior=repl,
            program=repl, mat_bits=repl,
        )
        rays_sh = RayBatch(pos=shard, vel=shard, life=shard)
        from python_raytracer_tpu.ops.march import HitRecords

        hits_sh = HitRecords(vid=shard, u=shard, flip=shard, count=shard,
                             cell=None)
        f_fwd = jax.jit(fwd, in_shardings=(arrays_sh, rays_sh, repl),
                        out_shardings=hits_sh)
        f_bwd = jax.jit(
            bwd,
            in_shardings=(arrays_sh, repl, hits_sh, shard, shard),
            out_shardings=(arrays_sh, repl, repl))

    def step(arrays: SceneArrays, opt_state, rays: RayBatch, target, key):
        hits = f_fwd(arrays, rays, key)
        return f_bwd(arrays, opt_state, hits, rays.vel, target)

    step.f_fwd = f_fwd
    step.f_bwd = f_bwd
    return step
