"""Multiprocess VTM low-delay sweep over video frame directories.

Counterpart of reference scripts/codecs/vvc-video-mp.py: each job encodes
one video (a directory of ordered frames, e.g. UVG-1080p) at one QP with
the committed low-delay config. Requires VTM binaries (VTM_BIN_DIR).

Usage: python scripts/codecs/vvc-video-mp.py -n uvg-1080p -o out.json
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
    frame_dir, qp, max_frames = job
    from vvc import vtm_encode_decode_video
    frames = sorted(Path(frame_dir).glob('*.*'))
    bpp, psnr = vtm_encode_decode_video(frames, qp, max_frames=max_frames)
    return str(frame_dir), qp, bpp, psnr


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('-n', '--dataset', type=str, default='uvg-1080p')
    ap.add_argument('-q', '--qps', type=int, nargs='+',
                    default=list(range(20, 45, 4)))
    ap.add_argument('-f', '--max_frames', type=int, default=96)
    ap.add_argument('-o', '--output', type=str, required=True)
    ap.add_argument('-p', '--processes', type=int, default=mp.cpu_count())
    args = ap.parse_args()

    from lvae_tpu.paths import known_datasets
    root = Path(known_datasets.get(args.dataset, args.dataset))
    video_dirs = sorted(d for d in root.iterdir() if d.is_dir())
    assert video_dirs, f'no frame directories under {root}'

    jobs = [(str(d), q, args.max_frames) for q in args.qps for d in video_dirs]
    per = {}
    with mp.Pool(args.processes) as pool:
        for d, qp, bpp, psnr in pool.imap_unordered(_one_job, jobs):
            per.setdefault(qp, []).append((bpp, psnr))
            print(f'{Path(d).name} QP{qp}: bpp={bpp:.4f} psnr={psnr:.3f}',
                  flush=True)
    results = {'bpp': [], 'psnr': []}
    for qp in args.qps:
        vals = np.array(per[qp])
        results['bpp'].append(float(vals[:, 0].mean()))
        results['psnr'].append(float(vals[:, 1].mean()))
    Path(args.output).write_text(json.dumps(
        {'results': results, 'qps': args.qps,
         'codec': 'vtm-18.0-lowdelay', 'dataset': args.dataset}, indent=4))


if __name__ == '__main__':
    main()
