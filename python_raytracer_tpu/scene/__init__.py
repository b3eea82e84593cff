from python_raytracer_tpu.scene.material import Material, rgb
from python_raytracer_tpu.scene.frame import Frame
from python_raytracer_tpu.scene.sprite import Sprite
from python_raytracer_tpu.scene.object import Object
from python_raytracer_tpu.scene.scene import Scene
from python_raytracer_tpu.scene.compile import CompiledScene, GridSpec, compile_scene
