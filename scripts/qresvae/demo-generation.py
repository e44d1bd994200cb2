"""Generative-feature demos: unconditional sampling, latent interpolation,
and inpainting (script versions of the reference's notebooks
scripts/qresvae/*.ipynb — uncond-sampling, latent-space-interpolation,
inpainting).
"""
import argparse
from pathlib import Path

import numpy as np
from PIL import Image

from lvae_tpu.registry import get_model
from lvae_tpu.models.base import image_to_batch, batch_to_image
from lvae_tpu.training.trainer import parse_model_args


def save_grid(ims, path, cols=None):
    n = ims.shape[0]
    cols = cols or int(np.ceil(np.sqrt(n)))
    rows = int(np.ceil(n / cols))
    H, W = ims.shape[1], ims.shape[2]
    grid = np.ones((rows * H, cols * W, 3), np.float32)
    for i in range(n):
        r, c = divmod(i, cols)
        grid[r * H:(r + 1) * H, c * W:(c + 1) * W] = ims[i]
    batch_to_image(grid[None]).save(path)
    print(f'saved {path}')


def demo_uncond(model, out_dir, seed):
    for t in (0.6, 0.8, 1.0):
        ims = model.uncond_sample((6, 2, 2), temprature=t, seed=seed)
        save_grid(ims, out_dir / f'uncond_t{t}.png')


def demo_interpolation(model, img_a, img_b, out_dir, steps=7):
    """Linear interpolation in latent space between two images."""
    za = [st['z'] for st in model.forward_get_latents(image_to_batch(Image.open(img_a)))]
    zb = [st['z'] for st in model.forward_get_latents(image_to_batch(Image.open(img_b)))]
    frames = []
    for a in np.linspace(0, 1, steps):
        z_mix = [(1 - a) * x + a * y for x, y in zip(za, zb)]
        frames.append(model.cond_sample(z_mix, temprature=0)[0])
    save_grid(np.stack(frames), out_dir / 'interpolation.png', cols=steps)


def demo_inpaint(model, img, out_dir, box=(0.3, 0.3, 0.7, 0.7)):
    im = np.asarray(image_to_batch(Image.open(img)))
    masked = im.copy()
    h, w = im.shape[1], im.shape[2]
    masked[:, round(box[1] * h):round(box[3] * h),
           round(box[0] * w):round(box[2] * w)] = 0.5
    out = model.inpaint(masked, box, steps=4)
    save_grid(np.concatenate([im, masked, out]), out_dir / 'inpaint.png', cols=3)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('-m', '--model', type=str, default='qres17m')
    parser.add_argument('-a', '--model_args', type=str, default='')
    parser.add_argument('-o', '--out_dir', type=str, default='runs/demo')
    parser.add_argument('--image_a', type=str, default=None)
    parser.add_argument('--image_b', type=str, default=None)
    parser.add_argument('--seed', type=int, default=0)
    args = parser.parse_args()

    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    model = get_model(args.model, **parse_model_args(args.model_args))
    demo_uncond(model, out_dir, args.seed)
    if args.image_a and args.image_b:
        demo_interpolation(model, args.image_a, args.image_b, out_dir)
        demo_inpaint(model, args.image_a, out_dir)


if __name__ == '__main__':
    main()
