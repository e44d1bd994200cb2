"""CompressAI baseline evaluation (comparison tables)
(reference: scripts/eval-compressai.py).

Evaluates bmshj2018 / mbt2018 / cheng2020 factorized/hyperprior baselines
when the `compressai` package is installed (it is NOT part of this
framework's dependencies — these are third-party torch models used purely
for comparison tables). Without compressai, the committed baseline numbers
in results/ (e.g. results/kodak/kodak-vtm-compressai.json) remain the
comparison source.
"""
import argparse
import json
import math
from collections import defaultdict
from pathlib import Path

import numpy as np
from PIL import Image

from lvae_tpu.paths import known_datasets


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('-m', '--models', type=str, nargs='+',
                        default=['bmshj2018-factorized', 'bmshj2018-hyperprior',
                                 'mbt2018', 'cheng2020-anchor'])
    parser.add_argument('-n', '--dataset', type=str, default='kodak')
    parser.add_argument('-q', '--qualities', type=int, nargs='+',
                        default=list(range(1, 9)))
    args = parser.parse_args()

    try:
        import torch
        from compressai.zoo import image_models
    except ImportError:
        print('compressai is not installed; using the committed baseline '
              'JSONs under results/ instead:')
        for p in sorted(Path('results').rglob('*compressai*.json')):
            print(' ', p)
        return

    root = known_datasets.get(args.dataset, Path(args.dataset))
    img_paths = sorted(Path(root).rglob('*.*'))

    for name in args.models:
        all_stats = defaultdict(list)
        for q in args.qualities:
            model = image_models[name](quality=q, pretrained=True).eval()
            bpps, psnrs = [], []
            for p in img_paths:
                img = Image.open(p).convert('RGB')
                x = torch.from_numpy(
                    np.asarray(img, np.float32) / 255).permute(2, 0, 1)[None]
                with torch.no_grad():
                    out = model.compress(x)
                    rec = model.decompress(out['strings'], out['shape'])['x_hat']
                num_bits = sum(len(s[0]) for s in out['strings']) * 8
                bpps.append(num_bits / (img.height * img.width))
                mse = float(torch.mean((rec.clamp(0, 1) - x) ** 2))
                psnrs.append(-10 * math.log10(max(mse, 1e-12)))
            all_stats['bpp'].append(float(np.mean(bpps)))
            all_stats['psnr'].append(float(np.mean(psnrs)))
            print(f'{name} q{q}: bpp={all_stats["bpp"][-1]:.4f} '
                  f'psnr={all_stats["psnr"][-1]:.3f}')
        out_path = Path(f'runs/results/{args.dataset}-{name}.json')
        out_path.parent.mkdir(parents=True, exist_ok=True)
        with open(out_path, 'w') as f:
            json.dump({'name': name, 'results': dict(all_stats)}, f, indent=4)


if __name__ == '__main__':
    main()
