from python_raytracer_tpu.ops.march import march, RayBatch, MarchResult, HitRecords
from python_raytracer_tpu.ops.render import render_frame, render_rays
from python_raytracer_tpu.ops.camera import generate_rays, pixel_grid
from python_raytracer_tpu.ops.compact import march_compacted
from python_raytracer_tpu.ops.diff import make_diff_renderer
