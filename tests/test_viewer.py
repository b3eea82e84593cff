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


def test_viewer_interactive_session():
    """Interactive smoke under the dummy SDL driver: a scripted session
    presses movement keys, rotates with the keypad, zooms with the wheel,
    toggles mouselook and quits — the player must have moved/rotated and
    the lens changed (the closest to an xvfb session this image allows;
    there is no Xvfb binary)."""
    import time

    import pygame as pg

    from python_raytracer_tpu.models.default import build_default_scene, default_settings
    from python_raytracer_tpu.runtime.engine import Engine
    from python_raytracer_tpu.runtime.viewer import run_viewer

    st = default_settings().replace(width=16, height=12, scale=2, fps=60,
                                    gravity=0.0)
    engine = Engine(build_default_scene(st))
    player = engine.scene.player
    pos0 = tuple(player.pos)
    rot0 = tuple(player.rot)
    lens0 = engine.lens

    def wait_frames(n, timeout=60):
        """Block until the engine has advanced n more frames (the first
        frame includes jit compile, so wall-clock sleeps are useless)."""
        start = engine.frame_index
        t0 = time.time()
        while engine.frame_index < start + n and time.time() - t0 < timeout:
            time.sleep(0.02)

    def script():
        post = pg.event.post
        wait_frames(2)
        post(pg.event.Event(pg.KEYDOWN, key=pg.K_w))
        wait_frames(3)
        post(pg.event.Event(pg.KEYUP, key=pg.K_w))
        post(pg.event.Event(pg.KEYDOWN, key=pg.K_KP4))
        wait_frames(3)
        post(pg.event.Event(pg.KEYUP, key=pg.K_KP4))
        post(pg.event.Event(pg.MOUSEWHEEL, y=1, x=0))
        post(pg.event.Event(pg.KEYDOWN, key=pg.K_TAB))
        wait_frames(2)
        post(pg.event.Event(pg.QUIT))

    t = threading.Thread(target=script, daemon=True)
    t.start()
    run_viewer(engine)
    t.join(timeout=5)

    assert tuple(player.pos) != pos0, "W key should have moved the player"
    assert tuple(player.rot) != rot0, "keypad should have rotated the player"
    assert engine.lens != lens0, "mouse wheel should have changed the lens"
