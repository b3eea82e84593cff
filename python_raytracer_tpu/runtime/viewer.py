"""Interactive Pygame viewer: window, HUD and input mapping.

The display/input half of the reference's ``Window`` (reference
``init.py:156-181`` setup, ``init.py:263-351`` event handling,
``init.py:256-259`` HUD): WASD/arrows move, R/F or Space/Ctrl jump/crouch,
keypad rotates, Tab toggles mouselook, mouse wheel changes the lens, Shift
sprints, Escape quits. Rendering happens on the TPU through the Engine; only
the final window-scaled frame crosses to the host for display.
"""

from __future__ import annotations

import math
import os
from typing import Tuple

import numpy as np

from python_raytracer_tpu.runtime.engine import Engine


def run_viewer(engine: Engine):  # pragma: no cover - interactive
    import pygame as pg

    st = engine.settings
    pg.init()
    pg.display.set_caption("Voxel Tracer (TPU)")
    screen = pg.display.set_mode(st.window_scaled)
    font = pg.font.SysFont(None, 24)
    clock = pg.time.Clock()
    mouselook = True
    running = True
    input_vel = [0, 0, 0]
    input_rot = [0.0, 0.0, 0.0]

    keymap_vel = {
        pg.K_w: (2, +1), pg.K_UP: (2, +1),
        pg.K_s: (2, -1), pg.K_DOWN: (2, -1),
        pg.K_a: (0, +1), pg.K_LEFT: (0, +1),
        pg.K_d: (0, -1), pg.K_RIGHT: (0, -1),
        pg.K_r: (1, +1), pg.K_SPACE: (1, +1),
        pg.K_f: (1, -1), pg.K_LCTRL: (1, -1),
    }
    keymap_rot = {
        pg.K_KP2: (2, +10), pg.K_KP8: (2, -10),
        pg.K_KP4: (1, +10), pg.K_KP6: (1, -10),
        pg.K_KP7: (0, +10), pg.K_KP9: (0, -10),
    }

    while running:
        clock.tick(st.fps)
        dt = min(1, clock.get_time() / 1000)
        mouse_rot = [0.0, 0.0]

        for e in pg.event.get():
            if e.type == pg.QUIT:
                running = False
            elif e.type == pg.MOUSEMOTION and mouselook:
                x, y = pg.mouse.get_pos()
                cx, cy = st.window_scaled[0] / 2, st.window_scaled[1] / 2
                mouse_rot[0] += cx - x
                mouse_rot[1] += cy - y
                pg.mouse.set_pos((cx, cy))
                pg.event.clear(pg.MOUSEMOTION)
            elif e.type == pg.MOUSEWHEEL:
                engine.lens = max(math.pi, min(math.pi * 48, engine.lens - e.y * 10))
            elif e.type == pg.KEYDOWN:
                if e.key == pg.K_ESCAPE:
                    running = False
                elif e.key == pg.K_TAB:
                    mouselook = not mouselook
                elif e.key in keymap_vel:
                    axis, sign = keymap_vel[e.key]
                    input_vel[axis] += sign
                elif e.key in keymap_rot:
                    axis, sign = keymap_rot[e.key]
                    input_rot[axis] += sign
            elif e.type == pg.KEYUP:
                if e.key in keymap_vel:
                    axis, sign = keymap_vel[e.key]
                    input_vel[axis] -= sign
                elif e.key in keymap_rot:
                    axis, sign = keymap_rot[e.key]
                    input_rot[axis] -= sign

        # the dummy SDL driver never reports focus; treat it as focused so
        # headless sessions (tests, CI smokes) actually step the engine
        focused = pg.mouse.get_focused() or os.environ.get(
            "SDL_VIDEODRIVER") == "dummy"
        if focused:
            image = engine.step(dt)
            if image is None:
                break
            surf = pg.Surface((image.shape[1], image.shape[0]))
            if image.shape[0] != st.window_scaled[1]:
                # host_scale engine: the window scale happens HERE, on the
                # host, like the reference's pygame scale (init.py:245-253)
                s = pg.Surface((image.shape[1], image.shape[0]))
                pg.surfarray.blit_array(s, np.clip(
                    image[..., :3], 0, 255).astype(np.uint8).transpose(1, 0, 2))
                image = pg.surfarray.array3d(
                    (pg.transform.smoothscale if st.smooth else
                     pg.transform.scale)(s, st.window_scaled)
                ).transpose(1, 0, 2)
                pg.surfarray.blit_array(surf, image.transpose(1, 0, 2))
            else:
                pg.surfarray.blit_array(surf, np.clip(image[..., :3], 0, 255).astype(np.uint8).transpose(1, 0, 2))
            text = font.render(
                f"{st.width} x {st.height} ({st.width * st.height}px) - "
                f"{math.trunc(clock.get_fps())} / {st.fps} FPS",
                True, (255, 255, 255),
            )
            screen.blit(surf, (0, 0))
            screen.blit(text, (0, 0))
            pg.display.flip()
            pg.mouse.set_visible(not mouselook)

        sprint = bool(pg.key.get_mods() & pg.KMOD_SHIFT)
        engine.apply_input(tuple(input_vel), tuple(input_rot), tuple(mouse_rot), dt, sprint)

    pg.quit()
