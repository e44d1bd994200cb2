"""Generate a synthetic natural-statistics image dataset.

This environment has no network access to COCO/Kodak, so training-run
artifacts (loss curves, MFU, device-coder rate-overhead measurements) use
images sampled here: smooth multi-scale backgrounds (1/f-like spectra),
soft-edged geometric occluders, linear gradients, and mild sensor noise —
enough structure that a compression model learns non-trivial priors, scales
and residual statistics (unlike white noise, which makes every latent an
escape symbol).

Usage:
    python scripts/gen-synthetic-dataset.py --out runs/synth-train --num 512
    python scripts/gen-synthetic-dataset.py --out runs/synth-val \
        --num 24 --size 512 768 --seed 99
"""
import argparse
from pathlib import Path

import numpy as np
from PIL import Image


def _smooth_field(rng, h, w, scale):
    """Low-resolution noise bilinearly upsampled -> smooth random field."""
    lh, lw = max(h // scale, 2), max(w // scale, 2)
    low = rng.normal(size=(lh, lw))
    img = Image.fromarray((low * 127 + 128).clip(0, 255).astype(np.uint8))
    return np.asarray(img.resize((w, h), Image.BILINEAR), np.float32) / 255.0


def synth_image(rng, h, w):
    # multi-scale smooth background per channel, channels correlated
    base = sum(_smooth_field(rng, h, w, s) * a for s, a in
               [(64, 1.0), (16, 0.5), (4, 0.25)])
    base = (base - base.min()) / (np.ptp(base) + 1e-9)
    tint = rng.uniform(0.3, 1.0, size=3)
    img = base[..., None] * tint + rng.uniform(0, 0.3, size=3)

    # linear gradient
    gy, gx = np.mgrid[0:h, 0:w].astype(np.float32)
    ang = rng.uniform(0, 2 * np.pi)
    grad = (np.cos(ang) * gx / w + np.sin(ang) * gy / h)
    img += grad[..., None] * rng.uniform(-0.25, 0.25, size=3)

    # soft-edged occluders (rectangles / ellipses)
    for _ in range(rng.integers(2, 7)):
        cy, cx = rng.uniform(0, h), rng.uniform(0, w)
        ry, rx = rng.uniform(h * 0.05, h * 0.4), rng.uniform(w * 0.05, w * 0.4)
        if rng.random() < 0.5:  # ellipse
            d = ((gy - cy) / ry) ** 2 + ((gx - cx) / rx) ** 2
            mask = np.clip(1.0 - d, 0, 1) ** 0.5
        else:                   # rounded rectangle via product of sigmoids
            sy = 1 / (1 + np.exp(-(ry - np.abs(gy - cy)) / 3.0))
            sx = 1 / (1 + np.exp(-(rx - np.abs(gx - cx)) / 3.0))
            mask = sy * sx
        color = rng.uniform(0, 1, size=3)
        alpha = rng.uniform(0.4, 1.0)
        img = img * (1 - alpha * mask[..., None]) + \
            color * (alpha * mask[..., None])

    # mild sensor noise + quantize
    img += rng.normal(scale=rng.uniform(0.0, 0.02), size=img.shape)
    return (np.clip(img, 0, 1) * 255).round().astype(np.uint8)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--out', type=str, required=True)
    ap.add_argument('--num', type=int, default=512)
    ap.add_argument('--size', type=int, nargs='+', default=[320])
    ap.add_argument('--seed', type=int, default=0)
    args = ap.parse_args()
    h = args.size[0]
    w = args.size[1] if len(args.size) > 1 else h
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    for i in range(args.num):
        Image.fromarray(synth_image(rng, h, w)).save(out / f'syn{i:05d}.png')
    print(f'wrote {args.num} {h}x{w} images to {out}')


if __name__ == '__main__':
    main()
