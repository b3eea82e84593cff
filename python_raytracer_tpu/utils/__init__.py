from python_raytracer_tpu.utils.mathutils import (
    cheb_normalize,
    euler_to_quat,
    quat_multiply,
    quat_vec_forward,
    quat_vec_right,
    quat_vec_up,
    snapped,
    mix,
    normalize01,
)
