"""Mod API: load reference-format mods into a Scene.

The reference's content pipeline is a mod directory ``mods/<name>/`` holding
``config.cfg`` + ``init.py``; the init script is imported for side effects
after settings exist and builds the scene through ``data.Material`` /
``data.Sprite`` / ``data.Object``, ``lib`` math types and the builtin shader
symbols, finally assigning ``data.player`` and ``data.background``
(reference ``data.py:14-17,627``, authoring ABI ``README.md:110-124``).

This module provides that exact authoring surface over the TPU scene layer:
``load_mod`` executes the mod script with shim ``lib``/``data`` modules whose
names resolve to the TPU classes, so reference-style mods run unmodified.
Material ``function`` callbacks map to vectorized material programs
(ops/programs.py) — the builtin ``material``/``material_background`` symbols
are provided; custom per-hit Python callbacks must be re-registered as
programs via ``register_program`` (they cannot run inside a TPU kernel).
"""

from __future__ import annotations

import math
import os
import sys
import types
from typing import Optional

from python_raytracer_tpu.config import Settings
from python_raytracer_tpu.scene import Frame, Material, Object, Scene, Sprite
from python_raytracer_tpu.scene.material import rgb as _rgb_tuple


class vec2:
    """Minimal authoring 2D vector (reference lib.py:13-163 surface)."""

    __slots__ = ("x", "y")

    def __init__(self, x, y):
        self.x, self.y = x, y

    def __getitem__(self, i):
        return (self.x, self.y)[i]

    def __iter__(self):
        return iter((self.x, self.y))

    def __len__(self):
        return 2

    def _bin(self, other, op):
        if isinstance(other, vec2):
            return vec2(op(self.x, other.x), op(self.y, other.y))
        return vec2(op(self.x, other), op(self.y, other))

    def __add__(self, o):
        return self._bin(o, lambda a, b: a + b)

    def __sub__(self, o):
        return self._bin(o, lambda a, b: a - b)

    def __mul__(self, o):
        return self._bin(o, lambda a, b: a * b)

    def __truediv__(self, o):
        return self._bin(o, lambda a, b: a / b)

    def __floordiv__(self, o):
        return self._bin(o, lambda a, b: a // b)

    def __neg__(self):
        return vec2(-self.x, -self.y)

    def __eq__(self, o):
        if isinstance(o, vec2):
            return self.x == o.x and self.y == o.y
        return self.x == o and self.y == o

    def __ne__(self, o):
        return not self.__eq__(o)

    def array(self):
        return [self.x, self.y]

    def tuple(self):
        return (self.x, self.y)

    def mins(self):
        return min(self.x, self.y)

    def maxs(self):
        return max(self.x, self.y)

    def min(self, o):
        if isinstance(o, vec2):
            return vec2(min(self.x, o.x), min(self.y, o.y))
        return vec2(min(self.x, o), min(self.y, o))

    def max(self, o):
        if isinstance(o, vec2):
            return vec2(max(self.x, o.x), max(self.y, o.y))
        return vec2(max(self.x, o), max(self.y, o))

    def distance(self, other):
        return math.dist(self.array(), [other[0], other[1]])

    def total(self):
        return (abs(self.x) + abs(self.y)) / 2

    def mix(self, other, bias1):
        return self * (1 - bias1) + other * bias1

    def normalize(self):
        ref = max(abs(self.x), abs(self.y))
        if ref and ref != 1:
            return vec2(self.x / ref, self.y / ref)
        return self

    def snapped(self, unit):
        if isinstance(unit, vec2):
            return vec2((self.x // unit.x) * unit.x, (self.y // unit.y) * unit.y)
        return vec2((self.x // unit) * unit, (self.y // unit) * unit)


class vec3:
    """Minimal authoring 3D vector (reference lib.py:166-338 surface)."""

    __slots__ = ("x", "y", "z")

    def __init__(self, x, y, z):
        self.x, self.y, self.z = x, y, z

    def __getitem__(self, i):
        return (self.x, self.y, self.z)[i]

    def __iter__(self):
        return iter((self.x, self.y, self.z))

    def __len__(self):
        return 3

    def _bin(self, other, op):
        if isinstance(other, vec3):
            return vec3(op(self.x, other.x), op(self.y, other.y), op(self.z, other.z))
        return vec3(op(self.x, other), op(self.y, other), op(self.z, other))

    def __add__(self, o):
        return self._bin(o, lambda a, b: a + b)

    def __sub__(self, o):
        return self._bin(o, lambda a, b: a - b)

    def __mul__(self, o):
        return self._bin(o, lambda a, b: a * b)

    def __truediv__(self, o):
        return self._bin(o, lambda a, b: a / b)

    def __floordiv__(self, o):
        return self._bin(o, lambda a, b: a // b)

    def __neg__(self):
        return vec3(-self.x, -self.y, -self.z)

    def array(self):
        return [self.x, self.y, self.z]

    def tuple(self):
        return (self.x, self.y, self.z)

    def mins(self):
        return min(self.x, self.y, self.z)

    def maxs(self):
        return max(self.x, self.y, self.z)

    def __eq__(self, o):
        if isinstance(o, vec3):
            return self.x == o.x and self.y == o.y and self.z == o.z
        return self.x == o and self.y == o and self.z == o

    def __ne__(self, o):
        return not self.__eq__(o)

    def __abs__(self):
        return vec3(abs(self.x), abs(self.y), abs(self.z))

    def min(self, o):
        if isinstance(o, vec3):
            return vec3(min(self.x, o.x), min(self.y, o.y), min(self.z, o.z))
        return vec3(min(self.x, o), min(self.y, o), min(self.z, o))

    def max(self, o):
        if isinstance(o, vec3):
            return vec3(max(self.x, o.x), max(self.y, o.y), max(self.z, o.z))
        return vec3(max(self.x, o), max(self.y, o), max(self.z, o))

    def total(self):
        return (abs(self.x) + abs(self.y) + abs(self.z)) / 3

    def mix(self, other, bias1):
        return self * (1 - bias1) + other * bias1

    def rotate(self, other):
        return vec3((self.x + other.x) % 360, (self.y + other.y) % 360,
                    (self.z + other.z) % 360)

    def normalize(self):
        from python_raytracer_tpu.utils.hostmath import cheb_normalize_h

        return vec3(*cheb_normalize_h((self.x, self.y, self.z)))

    def snapped(self, unit):
        if isinstance(unit, vec3):
            return vec3((self.x // unit.x) * unit.x, (self.y // unit.y) * unit.y,
                        (self.z // unit.z) * unit.z)
        return vec3((self.x // unit) * unit, (self.y // unit) * unit,
                    (self.z // unit) * unit)

    def distance(self, other):
        return math.dist(self.array(), [other[0], other[1], other[2]])

    def quaternion(self):
        """Euler degrees -> quaternion (reference lib.py:322-338)."""
        from python_raytracer_tpu.utils.hostmath import euler_to_quat_h

        return quaternion(*euler_to_quat_h((self.x, self.y, self.z)))


def rgb(r, g, b):
    return _rgb_tuple(r, g, b)


class quaternion:
    """Quaternion shim for mod scripts (reference lib.py:341-376 surface)."""

    __slots__ = ("x", "y", "z", "w")

    def __init__(self, x, y, z, w):
        self.x, self.y, self.z, self.w = x, y, z, w

    def __iter__(self):
        return iter((self.x, self.y, self.z, self.w))

    def __getitem__(self, i):
        return (self.x, self.y, self.z, self.w)[i]

    def dot(self, other):
        return self.x * other.x + self.y * other.y + self.z * other.z + self.w * other.w

    def multiply(self, other):
        from python_raytracer_tpu.utils.hostmath import quat_multiply_h

        return quaternion(*quat_multiply_h(tuple(self), tuple(other)))

    def vec_right(self):
        from python_raytracer_tpu.utils.hostmath import quat_vec_right_h

        return vec3(*quat_vec_right_h(tuple(self)))

    def vec_up(self):
        from python_raytracer_tpu.utils.hostmath import quat_vec_up_h

        return vec3(*quat_vec_up_h(tuple(self)))

    def vec_forward(self):
        from python_raytracer_tpu.utils.hostmath import quat_vec_forward_h

        return vec3(*quat_vec_forward_h(tuple(self)))


class store:
    """Dot-access property bag (reference lib.py:7-10)."""

    def __init__(self, **args):
        for a in args:
            setattr(self, a, args[a])


def grid(unit: int):
    """Most even 2D factorization of an integer (reference lib.py:398-401)."""
    i = math.isqrt(unit)
    while i > 0:
        if unit % i == 0:
            return unit // i, i
        i -= 1


def merge(items, items_new):
    """Dedup list union (reference lib.py:404-409)."""
    result = list(items)
    for item in items_new:
        if item not in result:
            result.append(item)
    return result


def unpack(items):
    """Flatten a list of containers (reference lib.py:412-416)."""
    result = []
    for item in items:
        result += item
    return result


def average(items):
    """Element-wise mean of equal-length lists (reference lib.py:419-428)."""
    if len(items[0]) <= 1:
        return items
    n = len(items[0])
    return [sum(item[slot] for item in items) / len(items) for slot in range(n)]


def rand(amp):
    """Uniform in +-amp; no draw when amp is falsy (reference lib.py:431-434)."""
    import random as _random

    if not amp:
        return 0
    return (-1 + _random.random() * 2) * amp


def mix(val1, val2, bias1):
    """Lerp (reference lib.py:437-439)."""
    return val1 * (1 - bias1) + val2 * bias1


def normalize(x, x_min, x_max):
    """Clamp-remap into [0, 1] (reference lib.py:442-445)."""
    if x_min >= x_max:
        return 0
    return min(1, max(0, (x - x_min) / (x_max - x_min)))


def material(ray, mat, settings):  # pragma: no cover - marker symbol
    """Marker for the builtin PBR material program (reference lib.py:448-460).

    Mods assign ``function = material``; the scene compiler maps it to the
    vectorized PBR program. Calling it directly is not supported on TPU.
    """
    raise RuntimeError("builtin material program marker; not host-callable")


def material_background(ray, settings):  # pragma: no cover - marker symbol
    """Marker for the builtin sky background (reference lib.py:463-476)."""
    raise RuntimeError("builtin background program marker; not host-callable")


def default_mods_root() -> str:
    return os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "mods")


def load_mod(
    mod: str = "default",
    mods_root: Optional[str] = None,
    settings: Optional[Settings] = None,
) -> Scene:
    """Execute ``mods/<mod>/init.py`` reference-style and return the Scene.

    ``settings`` overrides the mod's config.cfg (used by tests/tools to vary
    render settings while keeping the scene content)."""
    root = mods_root or default_mods_root()
    mod_dir = os.path.join(root, mod)
    cfg_path = os.path.join(mod_dir, "config.cfg")
    if settings is None:
        settings = Settings.from_cfg(cfg_path) if os.path.exists(cfg_path) else Settings()

    scene = Scene(settings)

    # lib shim: the reference mod preamble is `from lib import *`
    lib_mod = types.ModuleType("python_raytracer_tpu._mod_lib")
    for name, sym in (
        ("vec2", vec2), ("vec3", vec3), ("rgb", rgb), ("store", store),
        ("quaternion", quaternion),
        ("material", material), ("material_background", material_background),
        ("grid", grid), ("merge", merge), ("unpack", unpack),
        ("average", average), ("rand", rand), ("mix", mix), ("normalize", normalize),
    ):
        setattr(lib_mod, name, sym)

    # data shim: scene classes + settings + player/background assignment slots
    data_mod = types.ModuleType("python_raytracer_tpu._mod_data")
    data_mod.settings = settings
    data_mod.Material = Material
    data_mod.Frame = Frame
    data_mod.Sprite = Sprite
    data_mod.Object = Object
    data_mod.objects = scene.objects
    data_mod.player = None
    data_mod.background = None

    init_path = os.path.join(mod_dir, "init.py")
    if not os.path.exists(init_path):
        available = sorted(
            d for d in (os.listdir(root) if os.path.isdir(root) else [])
            if os.path.exists(os.path.join(root, d, "init.py"))
        )
        raise FileNotFoundError(
            f"Mod {mod!r} not found ({init_path} missing). "
            f"Available mods in {root}: {', '.join(available) or '(none)'}"
        )
    src = open(init_path).read()
    ns = {
        "__name__": f"mods.{mod}.init",
        "__file__": init_path,
        "lib": lib_mod,
        "data": data_mod,
        "MOD_DIR": mod_dir,
    }
    # `from lib import *` / `import data` must resolve to the shims
    saved = {k: sys.modules.get(k) for k in ("lib", "data")}
    sys.modules["lib"] = lib_mod
    sys.modules["data"] = data_mod
    cwd = os.getcwd()
    try:
        os.chdir(os.path.dirname(root))  # mods address assets as "mods/<mod>/..."
        with scene:
            exec(compile(src, init_path, "exec"), ns)
    finally:
        os.chdir(cwd)
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v

    scene.player = data_mod.player
    bg = data_mod.background
    if bg is not None:
        scene.background = "sky" if getattr(bg, "__name__", "") == "material_background" else bg
    return scene
