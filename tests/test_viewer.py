"""Viewer smoke test: boots under the dummy SDL driver, processes events,
steps the engine when focused, and exits cleanly on QUIT."""

import os
import threading

import pytest

os.environ.setdefault("SDL_VIDEODRIVER", "dummy")


def test_viewer_quits_cleanly():
    import pygame as pg

    from python_raytracer_tpu.models.default import build_default_scene, default_settings
    from python_raytracer_tpu.runtime.engine import Engine
    from python_raytracer_tpu.runtime.viewer import run_viewer

    st = default_settings().replace(width=16, height=12, scale=2, fps=60)
    engine = Engine(build_default_scene(st))

    def post_quit():
        # give the loop a few frames, then quit
        import time

        time.sleep(1.5)
        pg.event.post(pg.event.Event(pg.QUIT))

    t = threading.Thread(target=post_quit, daemon=True)
    t.start()
    run_viewer(engine)  # returns only on QUIT
    t.join(timeout=5)
