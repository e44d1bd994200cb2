"""Multiprocess VTM intra sweep: regenerate the still-image anchor JSONs.

Fans (image, QP) jobs over a process pool, caches per-job results to a
side JSON so interrupted sweeps resume, and writes the dataset-averaged
RD curve in the committed anchor format (results/*-vtm18.0.json).

Behavioral counterpart of reference scripts/codecs/vvc-intra-mp.py; requires
the VTM 18.0 binaries (VTM_BIN_DIR env var) — the committed anchors make
running this optional.

Usage: python scripts/codecs/vvc-intra-mp.py -n kodak -o out.json -p 8
"""
import argparse
import json
import multiprocessing as mp
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np


def _one_job(job):
    img_path, qp = job
    from vvc import vtm_encode_decode
    bpp, psnr = vtm_encode_decode(img_path, qp, intra=True)
    return str(img_path), qp, bpp, psnr


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('-n', '--dataset', type=str, default='kodak')
    ap.add_argument('-q', '--qps', type=int, nargs='+',
                    default=list(range(15, 51)))
    ap.add_argument('-o', '--output', type=str, required=True)
    ap.add_argument('-p', '--processes', type=int, default=mp.cpu_count())
    args = ap.parse_args()

    from lvae_tpu.paths import known_datasets
    root = Path(known_datasets.get(args.dataset, args.dataset))
    img_paths = sorted(p for p in root.rglob('*.*') if p.is_file())
    assert img_paths, f'no images under {root}'

    cache_path = Path(args.output).with_suffix('.cache.json')
    cache = {}
    if cache_path.is_file():
        cache = json.loads(cache_path.read_text())
        print(f'resuming: {len(cache)} cached jobs')

    jobs = [(p, q) for q in args.qps for p in img_paths
            if f'{p}|{q}' not in cache]
    if jobs:
        with mp.Pool(args.processes) as pool:
            for i, (pth, qp, bpp, psnr) in enumerate(
                    pool.imap_unordered(_one_job, jobs)):
                cache[f'{pth}|{qp}'] = [bpp, psnr]
                if i % 20 == 0:
                    cache_path.write_text(json.dumps(cache))
                    print(f'{i + 1}/{len(jobs)} jobs done', flush=True)
        cache_path.write_text(json.dumps(cache))

    results = {'bpp': [], 'psnr': [], 'mse': []}
    for qp in args.qps:
        vals = np.array([cache[f'{p}|{qp}'] for p in img_paths])
        results['bpp'].append(float(vals[:, 0].mean()))
        results['psnr'].append(float(vals[:, 1].mean()))
        results['mse'].append(float(np.mean(10 ** (-vals[:, 1] / 10))))
        print(f'QP {qp}: bpp={results["bpp"][-1]:.4f} '
              f'psnr={results["psnr"][-1]:.3f}')
    Path(args.output).write_text(json.dumps(
        {'results': results, 'qps': args.qps, 'codec': 'vtm-18.0-intra',
         'dataset': args.dataset}, indent=4))


if __name__ == '__main__':
    main()
