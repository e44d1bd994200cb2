"""Progressive / partial decoding study: reconstruct with only the first-k
latent blocks kept, sampling the remainder from the prior at t=0
(reference: scripts/qarv/robust-decoding.py:43-60).
"""
import argparse
import json
import math
from pathlib import Path

import numpy as np
from PIL import Image

from lvae_tpu.registry import get_model
from lvae_tpu.models.base import image_to_batch
from lvae_tpu.utils.coding import pad_divisible_by
from lvae_tpu.training.trainer import parse_model_args

log2_e = math.log2(math.e)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('-m', '--model', type=str, default='qarv_base')
    parser.add_argument('-a', '--model_args', type=str, default='')
    parser.add_argument('-i', '--image', type=str, required=True)
    parser.add_argument('-l', '--lmb', type=float, default=512.0)
    parser.add_argument('-o', '--output', type=str, default=None)
    args = parser.parse_args()

    model = get_model(args.model, **parse_model_args(args.model_args))
    img = Image.open(args.image).convert('RGB')
    im = image_to_batch(pad_divisible_by(img, model.max_stride))

    stats_all = model.forward_get_latents(im, lmb=args.lmb)
    latents = [st['z'] for st in stats_all]
    kls = [float(np.sum(st['kl'])) for st in stats_all]
    npix = img.height * img.width

    results = []
    for keep in range(1, model.num_latents + 1):
        partial = list(latents[:keep]) + [None] * (model.num_latents - keep)
        rec = model.conditional_sample(args.lmb, partial, t=0.0)
        rec = rec[:, :img.height, :img.width, :]
        real = np.asarray(image_to_batch(img))
        mse = float(np.mean(np.square(real - rec)))
        psnr = -10 * math.log10(max(mse, 1e-12))
        bpp_prefix = sum(kls[:keep]) * log2_e / npix
        results.append({'kept_latents': keep, 'bpp_prefix': round(bpp_prefix, 4),
                        'psnr': round(psnr, 3)})
        print(results[-1])

    if args.output:
        with open(args.output, 'w') as f:
            json.dump(results, f, indent=2)


if __name__ == '__main__':
    main()
