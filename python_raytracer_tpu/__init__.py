"""python_raytracer_tpu — a TPU-native differentiable voxel ray-marching framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
engine MirceaKitsune/python_raytracer (a pure-Python CPU voxel raytracer,
see /root/reference): sparse voxel worlds built from Materials/Sprites/Objects,
a per-pixel Chebyshev-norm ray march with material "shader" programs, a camera
post-effects stack, a voxel physics engine, chunk/LOD/occlusion culling and a
mod/content API — rebuilt TPU-first:

* scenes compile to dense device-resident voxel-id grids + a differentiable
  material parameter table (instead of dicts of Python Material objects),
* the ray march is a batched, masked `lax`-loop / Pallas kernel over pixel
  shards (instead of a Python while-loop per pixel in a process pool),
* material "functions" become vectorized material programs selected per hit,
* parallelism is `jax.sharding` over a device mesh (instead of mp.Pool pickle),
* everything in the compute path is differentiable w.r.t. material parameters.
"""

from python_raytracer_tpu.config import Settings
from python_raytracer_tpu.scene import Material, Frame, Sprite, Object, Scene
from python_raytracer_tpu.version import __version__
