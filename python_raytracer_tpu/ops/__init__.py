from python_raytracer_tpu.ops.march import march, RayBatch, MarchResult
from python_raytracer_tpu.ops.render import render_frame, render_rays
from python_raytracer_tpu.ops.camera import generate_rays, pixel_grid
