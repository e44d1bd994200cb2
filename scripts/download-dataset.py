"""Dataset downloader: kodak / clic2022-test / tecnick
(reference: scripts/download-dataset.py:25-49).

Note: environments without network egress must provision datasets manually
at the paths in lvae_tpu/paths.py.
"""
import argparse
import urllib.request
import zipfile
from pathlib import Path

from lvae_tpu.paths import known_datasets

KODAK_URLS = [f'http://r0k.us/graphics/kodak/kodak/kodim{i:02d}.png'
              for i in range(1, 25)]
CLIC_URL = 'https://data.vision.ee.ethz.ch/cvl/clic/test_2022.zip'
TECNICK_URL = ('https://sourceforge.net/projects/testimages/files/'
               'OLD/OLD_SAMPLING/testimages.zip')


def download(url, dst: Path):
    print(f'{url} -> {dst}')
    dst.parent.mkdir(parents=True, exist_ok=True)
    urllib.request.urlretrieve(url, dst)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('datasets', nargs='*', default=['kodak'])
    args = parser.parse_args()

    for name in args.datasets:
        if name == 'kodak':
            root = Path(known_datasets['kodak'])
            for url in KODAK_URLS:
                download(url, root / url.split('/')[-1])
        elif name == 'clic2022-test':
            root = Path(known_datasets['clic2022-test'])
            zpath = root.parent / 'test_2022.zip'
            download(CLIC_URL, zpath)
            with zipfile.ZipFile(zpath) as z:
                z.extractall(root)
        elif name == 'tecnick-rgb-1200':
            root = Path(known_datasets['tecnick-rgb-1200'])
            zpath = root.parent / 'testimages.zip'
            download(TECNICK_URL, zpath)
            with zipfile.ZipFile(zpath) as z:
                z.extractall(root.parent)
        else:
            raise ValueError(f'unknown dataset {name}')


if __name__ == '__main__':
    main()
