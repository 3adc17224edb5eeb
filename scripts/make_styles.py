"""Generate procedural style images (reference ships paper style assets in
data/image/ — SURVEY.md §2 "Style assets"; this environment is zero-egress
so we synthesize a comparable set: fire, starry swirls, waves, strokes).

    python scripts/make_styles.py --out data/styles --size 512
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import os

import numpy as np


def _fbm(rng, size, octaves=5):
    """Fractal value noise in [0,1]."""
    acc = np.zeros((size, size), np.float32)
    amp, total = 1.0, 0.0
    for o in range(octaves):
        n = 2 ** (o + 2)
        coarse = rng.random((n, n)).astype(np.float32)
        # bilinear upsample to size
        idx = np.linspace(0, n - 1, size)
        xi = np.clip(idx.astype(int), 0, n - 2)
        fx = idx - xi
        row = (coarse[xi] * (1 - fx)[:, None] + coarse[xi + 1] * fx[:, None])
        img = (row[:, xi] * (1 - fx)[None, :] + row[:, xi + 1] * fx[None, :])
        acc += amp * img
        total += amp
        amp *= 0.5
    return acc / total


def fire(rng, size):
    n = _fbm(rng, size)
    yy = np.linspace(1, 0, size)[:, None]
    heat = np.clip(n * 1.4 - (1 - yy) * 0.6, 0, 1) ** 1.5
    r = np.clip(heat * 2.2, 0, 1)
    g = np.clip(heat * 1.2 - 0.15, 0, 1)
    b = np.clip(heat * 0.5 - 0.25, 0, 1)
    return np.stack([r, g, b], -1)


def swirls(rng, size):
    yy, xx = np.meshgrid(np.linspace(-1, 1, size), np.linspace(-1, 1, size),
                         indexing="ij")
    img = np.zeros((size, size, 3), np.float32)
    for _ in range(12):
        cx, cy = rng.uniform(-1, 1, 2)
        rad = np.sqrt((xx - cx) ** 2 + (yy - cy) ** 2)
        ang = np.arctan2(yy - cy, xx - cx)
        sw = 0.5 + 0.5 * np.sin(8 * ang + 18 * rad)
        w = np.exp(-rad * 3)
        col = rng.uniform(0.2, 1.0, 3)
        img += (sw * w)[..., None] * col[None, None]
    img += 0.15 * _fbm(rng, size)[..., None]
    return np.clip(img / img.max(), 0, 1)


def waves(rng, size):
    yy, xx = np.meshgrid(np.linspace(0, 6, size), np.linspace(0, 6, size),
                         indexing="ij")
    n = _fbm(rng, size)
    w = 0.5 + 0.5 * np.sin(xx * 2 + 4 * n + yy)
    crest = np.clip(w - 0.75, 0, 1) * 4
    base = np.stack([0.1 + 0.2 * w, 0.3 + 0.3 * w, 0.5 + 0.4 * w], -1)
    return np.clip(base + crest[..., None], 0, 1)


def strokes(rng, size):
    img = 0.9 * np.ones((size, size, 3), np.float32)
    for _ in range(250):
        x0, y0 = rng.integers(0, size, 2)
        ang = rng.uniform(0, np.pi)
        ln = rng.integers(size // 16, size // 4)
        col = rng.uniform(0, 0.9, 3)
        th = rng.integers(1, max(2, size // 120) + 2)
        for t in range(ln):
            x = int(x0 + t * np.cos(ang))
            y = int(y0 + t * np.sin(ang))
            if 0 <= x < size - th and 0 <= y < size - th:
                img[y:y + th, x:x + th] = col
    return img


GENERATORS = {"fire": fire, "swirls": swirls, "waves": waves,
              "strokes": strokes}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="data/styles")
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()
    os.makedirs(args.out, exist_ok=True)
    from nfs_tpu.io.image import save_image

    rng = np.random.default_rng(args.seed)
    for name, gen in GENERATORS.items():
        img = gen(rng, args.size).astype(np.float32)
        save_image(os.path.join(args.out, f"{name}.png"), img)
        print(f"wrote {args.out}/{name}.png")


if __name__ == "__main__":
    main()
