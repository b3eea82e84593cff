"""Scene: the world registry (objects, player, background) + settings.

The reference keeps these as module globals — ``data.objects``,
``data.player``, ``data.background`` (reference ``data.py:80-82``) — mutated
by mod scripts at import time. The TPU build makes the scene an explicit
object so multiple scenes can coexist (tests, batched rendering), with a
default-scene mechanism so the reference's mod authoring style still works
(see modapi.py).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

from python_raytracer_tpu.config import Settings


class Scene:
    def __init__(self, settings: Optional[Settings] = None):
        self.settings = settings or Settings()
        self.objects: Dict[int, "Object"] = {}
        self.player = None
        # Background program name or callable tag; "sky" = the built-in
        # procedural gradient (reference lib.py:463-476). None = black.
        self.background: Optional[str] = None

    def activate(self) -> "Scene":
        """Make this the default scene new Objects register into."""
        global _current
        _current = self
        return self

    def __enter__(self) -> "Scene":
        self._prev = current_scene()
        return self.activate()

    def __exit__(self, *exc):
        global _current
        _current = self._prev
        return False


_current: Optional[Scene] = None


def current_scene() -> Scene:
    global _current
    if _current is None:
        _current = Scene()
    return _current
