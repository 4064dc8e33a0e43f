#!/usr/bin/env python3
"""Manual driving (reference: manual_control.py, SURVEY.md §3.5).

The reference opens a pyglet GL window; this environment is headless, so
two modes are provided:
 * TTY mode (default when stdin is a terminal): curses keyboard driving
   (arrows/WASD = steer, backspace = reset, q = quit) with a live ASCII
   viewport of the camera image.
 * --record mode: drive a scripted lane-follow controller and write the
   frames to an animated GIF for visual inspection.
 * --serve PORT: additionally stream the live view to a browser
   (dtown.utils.viewer.LiveViewer MJPEG server) — the headless
   equivalent of the reference's live GL window.
"""
from __future__ import annotations

import argparse
import sys

import numpy as np


def build_env(args):
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import dtown

    return dtown.make(
        args.env_name or args.map_name,
        camera_width=args.width,
        camera_height=args.height,
        domain_rand=args.domain_rand,
        distortion=args.distortion,
        seed=args.seed,
    )


def _make_viewer(args):
    if args.serve is None:
        return None
    from dtown.utils.viewer import LiveViewer

    v = LiveViewer(port=args.serve)
    print(f"live view: {v.url}", file=sys.stderr)
    return v


def record(args):
    env = build_env(args)
    viewer = _make_viewer(args)
    top = args.view == "top_down"
    obs = env.reset()
    frames = [env.render("top_down") if top else obs]
    obs, r, done, info = env.step([0.4, 0.0])
    ret = r
    frames.append(env.render("top_down") if top else obs)
    for t in range(args.steps - 1):
        obs, r, done, info = env.step(_lane_action(info))
        ret += r
        frames.append(env.render("top_down") if top else obs)
        if viewer is not None:
            viewer.update(frames[-1], caption=f"step {t} r={r:+.2f}")
        if done:
            break
    try:
        from PIL import Image

        imgs = [Image.fromarray(f) for f in frames]
        imgs[0].save(
            args.out, save_all=True, append_images=imgs[1:], duration=33,
            loop=0,
        )
        print(f"wrote {len(frames)} frames to {args.out}; return={ret:.1f}")
    except ImportError:
        np.save(args.out + ".npy", np.stack(frames))
        print(f"PIL missing; wrote raw frames to {args.out}.npy")


def _lane_action(info):
    lp = info["Simulator"]["lane_position"]
    steer = 10.0 * lp["dist"] + 0.12 * lp["angle_deg"]
    return [0.5, float(np.clip(steer, -4, 4))]


def tty(args):
    import curses

    env = build_env(args)
    viewer = _make_viewer(args)

    def loop(scr):
        curses.curs_set(0)
        scr.nodelay(True)
        env.reset()
        action = [0.0, 0.0]
        ret = 0.0
        chars = " .:-=+*#%@"
        while True:
            key = scr.getch()
            if key in (ord("q"), 27):
                break
            elif key in (curses.KEY_UP, ord("w")):
                action = [0.44, 0.0]
            elif key in (curses.KEY_DOWN, ord("s")):
                action = [-0.44, 0.0]
            elif key in (curses.KEY_LEFT, ord("a")):
                action = [0.35, 1.0]
            elif key in (curses.KEY_RIGHT, ord("d")):
                action = [0.35, -1.0]
            elif key in (curses.KEY_BACKSPACE, 127):
                env.reset()
                ret = 0.0
                action = [0.0, 0.0]
            elif key == ord(" "):
                action = [0.0, 0.0]
            obs, r, done, info = env.step(action)
            ret += r
            if viewer is not None:
                viewer.update(obs, caption=f"r={r:+.2f} ret={ret:+.1f}")
            if done:
                env.reset()
                ret = 0.0
            # ASCII viewport
            h, w = scr.getmaxyx()
            vh, vw = min(h - 2, 24), min(w - 1, 80)
            small = obs[:: max(1, obs.shape[0] // vh),
                        :: max(1, obs.shape[1] // vw)]
            lum = small.mean(axis=-1) / 255.0
            for y in range(min(vh, small.shape[0])):
                row = "".join(
                    chars[int(l * (len(chars) - 1))] for l in lum[y][:vw]
                )
                scr.addstr(y, 0, row)
            scr.addstr(
                vh, 0,
                f"r={r:+.2f} ret={ret:+.1f} speed="
                f"{info['Simulator']['robot_speed']:.2f}  (q quit, bksp reset)",
            )
            scr.refresh()

    curses.wrapper(loop)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--env-name", default=None)
    ap.add_argument("--map-name", default="udem1")
    ap.add_argument("--domain-rand", action="store_true")
    ap.add_argument("--distortion", action="store_true")
    ap.add_argument("--width", type=int, default=320)
    ap.add_argument("--height", type=int, default=240)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--record", action="store_true",
                    help="headless: write a GIF instead of TTY driving")
    ap.add_argument("--agent", default="lane")
    ap.add_argument("--view", default="camera",
                    choices=["camera", "top_down"],
                    help="--record viewpoint: the agent camera or the "
                         "bird's-eye map (render('top_down'))")
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--out", default="/tmp/dtown_drive.gif")
    ap.add_argument("--cpu", action="store_true",
                    help="force the local CPU backend")
    ap.add_argument("--serve", type=int, default=None, metavar="PORT",
                    help="stream the live view to a browser on PORT "
                         "(0 picks a free port) — the reference's "
                         "render('human') window, headless")
    args = ap.parse_args()

    if args.record or not sys.stdin.isatty():
        record(args)
    else:
        tty(args)


if __name__ == "__main__":
    main()
