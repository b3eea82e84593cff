"""Engine entry point: ``python -m python_raytracer_tpu [mod]``.

The TPU equivalent of the reference's ``python3 init.py [mod]`` boot
(reference ``data.py:15`` mod selection, ``init.py:474`` window start):
loads the mod, compiles the scene, and starts the interactive viewer — or a
headless N-frame run with ``--headless``.
"""

import argparse
import sys


def main():
    ap = argparse.ArgumentParser(prog="python_raytracer_tpu")
    ap.add_argument("mod", nargs="?", default="default")
    ap.add_argument("--headless", type=int, metavar="FRAMES", default=0,
                    help="render N frames without a window, save the last to PNG")
    ap.add_argument("--out", default="frame.png")
    ap.add_argument("--metrics", type=int, metavar="EVERY", default=0,
                    help="log a JSON-lines metric record (march stats + "
                         "per-phase ms) every EVERY frames")
    ap.add_argument("--metrics-file", default=None,
                    help="metric log path (default stdout)")
    ap.add_argument("--block", action="store_true",
                    help="render through the Pallas blockwise kernel "
                         "(TPU f32 fast path)")
    args = ap.parse_args()

    from python_raytracer_tpu.modapi import load_mod
    from python_raytracer_tpu.runtime.engine import Engine

    scene = load_mod(args.mod)
    metrics = None
    if args.metrics:
        from python_raytracer_tpu.utils.metrics import MetricLog

        metrics = MetricLog(args.metrics_file)
    engine = Engine(scene, metrics=metrics, metrics_every=args.metrics,
                    block=args.block)

    if args.headless:
        import numpy as np

        image = engine.run(args.headless)
        if image is not None:
            import os

            os.environ.setdefault("SDL_VIDEODRIVER", "dummy")
            import pygame as pg

            surf = pg.Surface((image.shape[1], image.shape[0]))
            pg.surfarray.blit_array(
                surf, np.clip(image[..., :3], 0, 255).astype(np.uint8).transpose(1, 0, 2)
            )
            pg.image.save(surf, args.out)
            print(f"rendered {args.headless} frames -> {args.out}")
        return

    from python_raytracer_tpu.runtime.viewer import run_viewer

    run_viewer(engine)


if __name__ == "__main__":
    main()
