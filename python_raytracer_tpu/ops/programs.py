"""Material programs: vectorized per-hit shaders.

The reference calls a Python function per voxel hit — ``mat.function(ray,
mat, settings)`` (reference ``init.py:81``), with the builtin "PBR" shader at
``lib.py:448-460`` and a documented ABI for custom mod shaders
(``README.md:96-108``). A Python callback per hit cannot run inside a TPU
kernel, so the TPU build turns shaders into **programs**: jit-compatible
functions vectorized over all rays that hit a material this step. Each
Material selects a program by name; per-hit dispatch is a masked select over
the (small) set of programs used by the scene — the MoE-style "expert
dispatch" view of the material system (SURVEY.md §2.2).

Program ABI (all arrays batched over N rays):

    def program(ray: HitRay, mat: MatParams, settings: Settings,
                draws: [N, 3] uniforms in [0,1)) -> (updates: dict, bounce: [N])

``updates`` may set any of color/energy/life/vel; ``bounce`` is the amount
added to the ray's bounce counter (the reference returns ``mat.absorption``).

Custom ray properties: the reference's ray is a ``store`` record, so a mod
shader can attach/mutate arbitrary per-ray fields that persist across the
ray's bounces (reference README.md:96, ray built at init.py:50-59). The TPU
equivalent is **registered ray state rows**: ``register_ray_property(name,
init)`` declares a named per-ray f32 scalar; the XLA march then carries one
[N] row per property in its loop state, programs read them as
``ray.aux[name]`` and update them by returning ``{name: new_values}`` in the
updates dict (masked to actual hits by the marcher, exactly like
color/energy/life/vel). The hit-replay backward (ops/diff.py) threads the
same rows, so gradients flow through custom-state chains.

Kernel dispatch: programs registered with a lane-major ``rows_fn``
(HitRayRows/MatRows ABI) run INSIDE the Pallas kernel through
``dispatch_rows``, so multi-program scenes keep the production path. Scenes
using custom ray properties, or any program without a rows variant, render
through the XLA march (ops/blockmarch.py blockmarch_supported decides the
fallback automatically).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional, Union

import jax.numpy as jnp

from python_raytracer_tpu.scene import material as M


@dataclasses.dataclass
class HitRay:
    """Per-hit view of the ray state (arrays batched [N] / [N, 3])."""

    color: jnp.ndarray  # [N, 3] 0..255
    energy: jnp.ndarray  # [N]
    life: jnp.ndarray  # [N]
    vel: jnp.ndarray  # [N, 3]
    bounces: jnp.ndarray  # [N]
    step: jnp.ndarray  # [N]
    aux: Optional[Dict[str, jnp.ndarray]] = None  # registered ray props, [N]


@dataclasses.dataclass
class MatParams:
    """Columns of the material table rows gathered for this hit ([N] each)."""

    albedo: jnp.ndarray  # [N, 3]
    roughness: jnp.ndarray
    absorption: jnp.ndarray
    ior: jnp.ndarray
    energy: jnp.ndarray


@dataclasses.dataclass
class HitRayRows:
    """Lane-major view of the ray state inside the Pallas kernel: scalar
    rows shaped [W] (vectors are component tuples). Mirrors HitRay."""

    color: tuple  # (r, g, b) rows
    energy: jnp.ndarray
    life: jnp.ndarray
    vel: tuple  # (x, y, z) rows
    bounces: jnp.ndarray
    step: jnp.ndarray
    aux: Optional[Dict[str, jnp.ndarray]] = None  # registered ray props, [W]


@dataclasses.dataclass
class MatRows:
    """Lane-major material params ([W] rows). Mirrors MatParams."""

    albedo: tuple  # (r, g, b) rows
    roughness: jnp.ndarray
    absorption: jnp.ndarray
    ior: jnp.ndarray
    energy: jnp.ndarray


def _mix(a, b, bias):
    return a * (1 - bias) + b * bias


def pbr_program(ray: HitRay, mat: MatParams, settings, draws):
    """Builtin simplified-PBR shader (reference lib.py:448-460).

    absorption falloff by bounce count, albedo/emission blend into the ray,
    life decay by roughness*absorption, velocity jitter by roughness, bounce
    amount = material absorption. Color rounding (rgb.mix rounds every blend,
    lib.py:393-395) is applied by the marcher when settings.exact.
    """
    absorption = jnp.minimum(
        1.0, mat.absorption / (1.0 + ray.bounces) ** (1.0 + settings.falloff)
    )
    color = _mix(ray.color, mat.albedo, absorption[:, None])
    energy = _mix(ray.energy, mat.energy, absorption)
    life = ray.life * (1.0 - mat.roughness * absorption)
    jitter = (-1.0 + draws * 2.0) * mat.roughness[:, None]
    vel = ray.vel + jitter
    return {"color": color, "energy": energy, "life": life, "vel": vel}, mat.absorption


def pbr_rows(ray: HitRayRows, mat: MatRows, settings, draws):
    """Lane-major pbr_program — the same float expressions on [W] rows, so
    the Pallas kernel's multi-program dispatch is bit-identical to the XLA
    march's (tests/test_blockmarch.py enforces it)."""
    absb = jnp.minimum(
        1.0, mat.absorption / (1.0 + ray.bounces) ** (1.0 + settings.falloff))
    color = tuple(c * (1 - absb) + a * absb
                  for c, a in zip(ray.color, mat.albedo))
    energy = ray.energy * (1 - absb) + mat.energy * absb
    life = ray.life * (1.0 - mat.roughness * absb)
    vel = tuple(v + (-1.0 + u * 2.0) * mat.roughness
                for v, u in zip(ray.vel, draws))
    return {"color": color, "energy": energy, "life": life,
            "vel": vel}, mat.absorption


_PROGRAMS: Dict[int, Callable] = {M.PROGRAM_PBR: pbr_program}
_PROGRAM_NAMES: Dict[str, int] = {"pbr": M.PROGRAM_PBR, "material": M.PROGRAM_PBR}
_CALLABLE_IDS: Dict[int, int] = {}
# Lane-major variants servable inside the Pallas kernel (march_blockwise
# multi-program dispatch). A program without one falls back to the XLA march.
_PROGRAM_ROWS: Dict[int, Callable] = {M.PROGRAM_PBR: pbr_rows}

# Registered custom ray properties: name -> initial value. The reference's
# "attach any field to the ray store" extensibility (README.md:96) maps to
# these declared per-ray f32 rows (see module docstring).
_RAY_PROPS: Dict[str, float] = {}
_BUILTIN_RAY_FIELDS = ("color", "energy", "life", "vel", "bounces", "step")


def register_ray_property(name: str, init: float = 0.0) -> None:
    """Declare a custom per-ray scalar carried across the march.

    Programs read it as ``ray.aux[name]`` and update it by returning
    ``{name: values}``. ``init`` is the value rays start with (the reference
    mod would set the field in its shader's first hit; here initialization is
    explicit because state rows are allocated up front)."""
    if name in _BUILTIN_RAY_FIELDS:
        raise ValueError(f"{name!r} is a builtin ray field")
    _RAY_PROPS[name] = float(init)


def unregister_ray_property(name: str) -> None:
    _RAY_PROPS.pop(name, None)


def ray_properties() -> tuple:
    """Static (name, init) tuple of the registered custom ray properties."""
    return tuple(sorted(_RAY_PROPS.items()))


def _ray_field(ray: HitRay, key: str):
    if key in _BUILTIN_RAY_FIELDS:
        return getattr(ray, key)
    return ray.aux[key]


def dispatch(programs_used, pids, ray: HitRay, mat: MatParams, settings, draws):
    """Run the material programs for a batch of hits.

    ``programs_used`` is the static tuple of program ids present in the
    scene (compile-time); ``pids`` the per-ray program id. With one program
    this is a direct call; with several, every program runs vectorized and
    results are masked-selected per ray (the small-expert dispatch of
    SURVEY.md §2.2 "EP").
    """
    if len(programs_used) == 1:
        return get_program(programs_used[0])(ray, mat, settings, draws)
    upd, bounce = None, None
    for pid in programs_used:
        u_i, b_i = get_program(pid)(ray, mat, settings, draws)
        if upd is None:
            upd, bounce = dict(u_i), b_i
        else:
            sel = pids == pid
            for key in set(upd) | set(u_i):
                base = upd.get(key, _ray_field(ray, key))
                new = u_i.get(key, _ray_field(ray, key))
                s_ = sel[:, None] if new.ndim == 2 else sel
                upd[key] = jnp.where(s_, new, base)
            bounce = jnp.where(sel, b_i, bounce)
    return upd, bounce


def register_program(name: str, fn: Callable,
                     rows_fn: Optional[Callable] = None) -> int:
    """Register a custom vectorized material program under a name.

    This is the TPU equivalent of assigning a Python function to
    ``Material(function=...)`` (reference README.md:110-124 mod ABI).

    ``rows_fn``: optional lane-major variant (HitRayRows/MatRows ABI,
    draws as a (u0, u1, u2) row tuple) that lets scenes using this program
    keep the Pallas-kernel production path. It MUST compute the same float
    expressions as ``fn`` (see pbr_rows) — the kernel and the XLA march are
    bit-compared in tests, and the hit-replay backward dispatches through
    ``fn``, so a drifting pair silently diverges gradients from the forward.
    """
    pid = max(_PROGRAMS.keys()) + 1
    _PROGRAMS[pid] = fn
    _PROGRAM_NAMES[name] = pid
    _CALLABLE_IDS[id(fn)] = pid
    if rows_fn is not None:
        _PROGRAM_ROWS[pid] = rows_fn
    return pid


def resolve_program(function: Union[None, str, Callable]) -> int:
    """Map a Material.function value to a program id."""
    if function is None:
        return M.PROGRAM_PBR
    if isinstance(function, str):
        if function in _PROGRAM_NAMES:
            return _PROGRAM_NAMES[function]
        raise KeyError(f"Unknown material program {function!r}; register_program() it first")
    if callable(function):
        pid = _CALLABLE_IDS.get(id(function))
        if pid is not None:
            return pid
        # The reference's builtin shader symbol (lib.material) maps to PBR.
        if getattr(function, "__name__", "") == "material":
            return M.PROGRAM_PBR
        raise KeyError(
            "Material.function callables must be registered with register_program(); "
            f"got {function!r}"
        )
    raise TypeError(f"Bad material function {function!r}")


def get_program(pid: int) -> Callable:
    return _PROGRAMS[pid]


def has_rows_program(pid: int) -> bool:
    """True when ``pid`` can be dispatched inside the Pallas kernel."""
    return pid in _PROGRAM_ROWS


def get_rows_program(pid: int) -> Callable:
    return _PROGRAM_ROWS[pid]


def _rows_field(ray: HitRayRows, key: str):
    if key in _BUILTIN_RAY_FIELDS:
        return getattr(ray, key)
    return ray.aux[key]


def dispatch_rows(programs_used, pid_row, ray: HitRayRows, mat: MatRows,
                  settings, draws):
    """Lane-major mirror of ``dispatch`` for the Pallas kernel: every
    program in the scene runs vectorized on the [W] rows and results are
    masked-selected by the per-lane program id, in the same accumulation
    order as ``dispatch`` so the select chain is bit-identical."""
    if len(programs_used) == 1:
        return get_rows_program(programs_used[0])(ray, mat, settings, draws)
    upd, bounce = None, None
    for pid in programs_used:
        u_i, b_i = get_rows_program(pid)(ray, mat, settings, draws)
        if upd is None:
            upd, bounce = dict(u_i), b_i
        else:
            sel = pid_row == pid
            for key in set(upd) | set(u_i):
                base = upd.get(key, _rows_field(ray, key))
                new = u_i.get(key, _rows_field(ray, key))
                if isinstance(new, tuple):
                    upd[key] = tuple(jnp.where(sel, n_, b_)
                                     for n_, b_ in zip(new, base))
                else:
                    upd[key] = jnp.where(sel, new, base)
            bounce = jnp.where(sel, b_i, bounce)
    return upd, bounce


# --- background programs (reference background ABI: f(ray, settings),
#     README.md:108; builtin sky at lib.py:463-476) ---

def sky_background(color, energy, vel, bounces, settings):
    """Builtin procedural sky (reference lib.py:463-476): gradient from the
    ray's final Y velocity, bounce falloff blend, then the only place ray
    energy multiplies into color. Returns (color, energy) pre-round — the
    marcher applies exact-mode rounding/clamping."""
    absorption = jnp.minimum(1.0, 1.0 / (1.0 + bounces) ** (1.0 + settings.falloff))
    up = jnp.maximum(0.0, vel[:, 1])
    sky_color = jnp.stack(
        [jnp.full_like(up, 127.0), 127.0 + up * 64.0, 127.0 + up * 128.0], axis=-1
    )
    sky_energy = 1.0 + up
    color = _mix(color, sky_color, absorption[:, None])
    energy = _mix(energy, sky_energy, absorption)
    return color, energy


_BACKGROUNDS: Dict[str, Callable] = {"sky": sky_background, "material_background": sky_background}


def register_background(name: str, fn: Callable) -> None:
    _BACKGROUNDS[name] = fn


def resolve_background(background: Union[None, str, Callable]) -> Optional[Callable]:
    if background is None:
        return None
    if isinstance(background, str):
        return _BACKGROUNDS[background]
    if callable(background):
        if getattr(background, "__name__", "") == "material_background":
            return sky_background
        return background
    raise TypeError(f"Bad background {background!r}")
