"""Materials: authored property bags that compile to a differentiable table.

The reference stores one Python ``Material`` object per voxel type — a property
bag whose ``function`` attribute is a Python callback called per ray hit
(reference ``data.py:85-93``; property schema ``README.md:79-88``). Materials
are shared by reference: editing one retints every voxel using it.

The TPU build keeps that authoring surface, but at compile time every distinct
Material becomes one **row of a dense float32 parameter table**
``[num_materials, NUM_PARAMS]`` on device, and its shader callback becomes an
index into a small set of vectorized material *programs* dispatched per hit
(see ops/programs.py). The table is the differentiable leaf: gradients of the
rendered image w.r.t. albedo/roughness/absorption/ior/energy flow into it.
"""

from __future__ import annotations

import copy as _copy
from typing import Any, Dict, Optional

import numpy as np


def rgb(r, g, b):
    """Color triplet constructor, API-compatible with the reference's rgb class
    (reference lib.py:379-395). Stored as a plain tuple."""
    return (r, g, b)


# Parameter table layout (one row per material).
PARAM_ALBEDO_R = 0
PARAM_ALBEDO_G = 1
PARAM_ALBEDO_B = 2
PARAM_ROUGHNESS = 3
PARAM_ABSORPTION = 4
PARAM_IOR = 5
PARAM_ENERGY = 6
PARAM_SOLIDITY = 7
PARAM_WEIGHT = 8
PARAM_FRICTION = 9
PARAM_ELASTICITY = 10
NUM_PARAMS = 11

# Built-in material programs (ops/programs.py). Program 0 is the default PBR
# shader equivalent to the reference's builtin ``lib.material`` (lib.py:448-460).
PROGRAM_PBR = 0


class Material:
    """A voxel material. Arbitrary kwargs become attributes (reference data.py:88-89).

    ``function`` selects the material program: ``None`` / ``"pbr"`` use the
    built-in PBR shader; a registered custom program name selects a vectorized
    user program (the TPU equivalent of the reference's per-hit Python
    callback ABI, README.md:96).
    """

    def __init__(self, **settings: Any):
        self.function = settings.get("function", None)
        self.albedo = (0, 0, 0)
        self.roughness = 0.0
        self.absorption = 0.0
        self.ior = 0.0
        self.energy = 0.0
        self.solidity = 0.0
        self.weight = 0.0
        self.friction = 0.0
        self.elasticity = 0.0
        for key, val in settings.items():
            setattr(self, key, val)

    def copy(self) -> "Material":
        """Independent deep copy (reference data.py:92-93)."""
        return _copy.deepcopy(self)

    def params(self) -> np.ndarray:
        """This material's row of the parameter table."""
        row = np.zeros((NUM_PARAMS,), dtype=np.float32)
        row[PARAM_ALBEDO_R : PARAM_ALBEDO_B + 1] = [float(c) for c in self.albedo]
        row[PARAM_ROUGHNESS] = self.roughness
        row[PARAM_ABSORPTION] = self.absorption
        row[PARAM_IOR] = self.ior
        row[PARAM_ENERGY] = self.energy
        row[PARAM_SOLIDITY] = self.solidity
        row[PARAM_WEIGHT] = self.weight
        row[PARAM_FRICTION] = self.friction
        row[PARAM_ELASTICITY] = self.elasticity
        return row


class MaterialRegistry:
    """Assigns dense integer ids to Material instances and builds the table.

    Id 0 is reserved for "empty" (no voxel). Identity-based: two equal-valued
    but distinct Material objects get distinct rows, matching the reference's
    share-by-reference semantics (README.md:77).
    """

    def __init__(self):
        self._ids: Dict[int, int] = {}  # id(material) -> dense id
        self._materials: list[Optional[Material]] = [None]  # index 0 = empty

    def register(self, mat: Optional[Material]) -> int:
        if mat is None:
            return 0
        key = id(mat)
        if key not in self._ids:
            self._ids[key] = len(self._materials)
            self._materials.append(mat)
        return self._ids[key]

    def __len__(self) -> int:
        return len(self._materials)

    def material(self, dense_id: int) -> Optional[Material]:
        return self._materials[dense_id]

    def table(self) -> np.ndarray:
        """Build the [K, NUM_PARAMS] float32 parameter table. Row 0 is zeros."""
        table = np.zeros((len(self._materials), NUM_PARAMS), dtype=np.float32)
        for i, mat in enumerate(self._materials):
            if mat is not None:
                table[i] = mat.params()
        return table

    def flags(self) -> Dict[str, np.ndarray]:
        """Static (non-differentiable) per-material flags used for control flow.

        * ``has_roughness`` — whether the authored roughness is nonzero. The
          reference's ``rand(amp)`` draws from the RNG only when amp is nonzero
          (lib.py:431-434), so the *number* of RNG draws per hit is a structural
          property of the authored material, not of the (differentiable) table.
        * ``has_ior`` — whether the IOR reflection branch runs (init.py:92).
        * ``program`` — material program index per material.
        """
        n = len(self._materials)
        has_roughness = np.zeros((n,), dtype=np.int32)
        has_ior = np.zeros((n,), dtype=np.int32)
        program = np.zeros((n,), dtype=np.int32)
        ior_class = np.zeros((n,), dtype=np.int32)
        from python_raytracer_tpu.ops.programs import resolve_program

        # IOR equality classes: the reference's neighbor test compares IOR
        # values for equality (init.py:106, "same IOR = solid neighbor").
        # Equality of authored floats is a discrete relation, so it compiles
        # to small integer classes packed into the cell word (class 0 is
        # reserved for ior == 0, which also encodes "no IOR branch",
        # init.py:92). Frozen at compile time — recompile after editing IOR.
        classes = {0.0: 0}
        for i, mat in enumerate(self._materials):
            if mat is not None:
                has_roughness[i] = 1 if mat.roughness else 0
                has_ior[i] = 1 if mat.ior else 0
                program[i] = resolve_program(mat.function)
                key = float(mat.ior)
                if key not in classes:
                    classes[key] = len(classes)
                ior_class[i] = classes[key]
        if len(classes) > 16:
            raise ValueError(
                f"{len(classes)} distinct IOR values exceed the 4-bit cell-word "
                "class budget; merge IOR values or widen WORD_IORCLS bits"
            )
        return {
            "has_roughness": has_roughness,
            "has_ior": has_ior,
            "program": program,
            "ior_class": ior_class,
        }
