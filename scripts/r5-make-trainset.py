"""Build the round-5 long-run trainset: 2048 synthetic images + real-photo
tiles (VERDICT r4 weak item 2: the 6k-step / 512-image operating point is
thin; "a longer run, ideally mixing in the committed real photos, would
make the rate-proof and overhead numbers representative").

Deterministic composition (everything is seeded or committed, so the
trainset — and hence a --fixseed run over it — is reproducible from HEAD):
  * 512 synthetic 320x320 images, seed 0   (byte-identical to the r2/r3
    runs/synth-train set, scripts/gen-synthetic-dataset.py defaults)
  * 1536 more synthetic 320x320 images, seed 7
  * 320x320 tiles cut from the committed real photos (images/*.png,
    512x768 / 576x512 / 256px), each tile repeated REPEAT times so real
    content is ~9%% of sampling mass

Usage:
    python scripts/r5-make-trainset.py            # -> runs/r5-trainset
"""
import runpy
import sys
from pathlib import Path

import numpy as np
from PIL import Image

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

OUT = ROOT / 'runs' / 'r5-trainset'
TILE = 320
REPEAT = 8
# committed real photos big enough to tile (images/README.md)
PHOTOS = ['photo1_512x768.png', 'photo2_512x768.png', 'photo3_512x768.png',
          'hopper_576x512.png', 'motor256.png']


def tile_positions(size, tile):
    """Tile offsets covering [0, size): evenly spaced, last flush."""
    if size <= tile:
        return [0]
    k = max(2, (size + tile - 1) // tile)
    return sorted({round(i * (size - tile) / (k - 1)) for i in range(k)})


def main():
    OUT.mkdir(parents=True, exist_ok=True)
    gen = runpy.run_path(str(ROOT / 'scripts' / 'gen-synthetic-dataset.py'))
    synth_image = gen['synth_image']

    rng = np.random.default_rng(0)
    for i in range(512):
        Image.fromarray(synth_image(rng, TILE, TILE)).save(
            OUT / f'syn{i:05d}.png')
    rng = np.random.default_rng(7)
    for i in range(512, 2048):
        Image.fromarray(synth_image(rng, TILE, TILE)).save(
            OUT / f'syn{i:05d}.png')

    n_real = 0
    for name in PHOTOS:
        img = np.asarray(Image.open(ROOT / 'images' / name).convert('RGB'))
        h, w = img.shape[:2]
        for top in tile_positions(h, TILE):
            for left in tile_positions(w, TILE):
                t = img[top:top + TILE, left:left + TILE]
                for r in range(REPEAT):
                    Image.fromarray(t).save(
                        OUT / f'real_{name.split(".")[0]}'
                              f'_{top}_{left}_r{r}.png')
                    n_real += 1
    print(f'wrote 2048 synthetic + {n_real} real tiles to {OUT}')


if __name__ == '__main__':
    main()
