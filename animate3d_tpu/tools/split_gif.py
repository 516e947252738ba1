"""Split the 4-view-wide MV-VDM GIF into per-view frame PNGs.

Parity target: tools/split_gif.py in the reference — the horizontal
concatenation is cut into n_view tiles per frame and each tile is saved as
``{view·F + frame}.png`` (the numbering the tracking step and the
multi-image dataset expect).
"""

from __future__ import annotations

import argparse
import os


def split_gif(gif_path: str, output_dir: str, n_views: int = 4) -> int:
    from PIL import Image, ImageSequence

    os.makedirs(output_dir, exist_ok=True)
    gif = Image.open(gif_path)
    frames = [f.convert("RGB").copy() for f in ImageSequence.Iterator(gif)]
    n_frames = len(frames)
    w, h = frames[0].size
    tile_w = w // n_views
    for view in range(n_views):
        for fi, frame in enumerate(frames):
            tile = frame.crop((view * tile_w, 0, (view + 1) * tile_w, h))
            tile.save(os.path.join(output_dir, f"{view * n_frames + fi}.png"))
    return n_frames


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--gif_path", required=True)
    parser.add_argument("--output_dir", required=True)
    parser.add_argument("--n_views", type=int, default=4)
    args = parser.parse_args()
    n = split_gif(args.gif_path, args.output_dir, args.n_views)
    print(f"split {n} frames × {args.n_views} views into {args.output_dir}")


if __name__ == "__main__":
    main()
