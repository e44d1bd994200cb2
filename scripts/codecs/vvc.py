"""VTM (VVC reference software) wrapper: subprocess driver for the
EncoderApp/DecoderApp binaries (reference: scripts/codecs/vvc.py:18-36).

The committed anchor JSONs under results/ were produced with VTM 18.0; this
driver exists so anchors can be regenerated when the binaries are available
(set VTM_BIN_DIR). RGB<->YUV444 conversion uses the BT.709-ish full-range
matrix the reference used via OpenCV.
"""
import argparse
import json
import math
import os
import subprocess
import tempfile
from pathlib import Path

import numpy as np
from PIL import Image

VTM_BIN_DIR = os.environ.get('VTM_BIN_DIR', '')
CFG_DIR = Path(__file__).parent / 'vtm18.0'


def rgb_to_yuv444(rgb: np.ndarray) -> np.ndarray:
    """Full-range BT.709 RGB -> YUV, uint8 in, uint8 out (H, W, 3)."""
    m = np.array([[0.2126, 0.7152, 0.0722],
                  [-0.1146, -0.3854, 0.5],
                  [0.5, -0.4542, -0.0458]])
    x = rgb.astype(np.float64) @ m.T
    x[..., 1:] += 128.0
    return np.clip(np.round(x), 0, 255).astype(np.uint8)


def yuv444_to_rgb(yuv: np.ndarray) -> np.ndarray:
    m = np.array([[1.0, 0.0, 1.5748],
                  [1.0, -0.1873, -0.4681],
                  [1.0, 1.8556, 0.0]])
    x = yuv.astype(np.float64)
    x[..., 1:] -= 128.0
    rgb = x @ m.T
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def vtm_encode_decode(img_path, qp, intra=True):
    """Run one VTM intra encode+decode round trip; returns (bpp, psnr_rgb)."""
    enc = Path(VTM_BIN_DIR) / 'EncoderApp'
    dec = Path(VTM_BIN_DIR) / 'DecoderApp'
    assert enc.is_file() and dec.is_file(), \
        f'VTM binaries not found under VTM_BIN_DIR={VTM_BIN_DIR!r}'
    cfg = CFG_DIR / ('encoder_intra_vtm.cfg' if intra else 'encoder_lowdelay_vtm.cfg')

    img = np.asarray(Image.open(img_path).convert('RGB'))
    h, w = img.shape[:2]
    yuv = rgb_to_yuv444(img)
    with tempfile.TemporaryDirectory() as td:
        td = Path(td)
        raw = td / 'in.yuv'
        # planar YUV444
        with open(raw, 'wb') as f:
            for c in range(3):
                f.write(yuv[..., c].tobytes())
        bit = td / 'out.bin'
        rec = td / 'rec.yuv'
        subprocess.run([
            str(enc), '-c', str(cfg), '-i', str(raw), '-b', str(bit),
            '-o', os.devnull, '-wdt', str(w), '-hgt', str(h),
            '-q', str(qp), '-f', '1', '-fr', '1',
            '--InputChromaFormat=444', '--InputBitDepth=8',
            '--ConformanceWindowMode=1',
        ], check=True, capture_output=True)
        subprocess.run([str(dec), '-b', str(bit), '-o', str(rec), '-d', '8'],
                       check=True, capture_output=True)
        num_bits = bit.stat().st_size * 8
        data = np.fromfile(rec, dtype=np.uint8)
        planes = data.reshape(3, h, w)
        rec_rgb = yuv444_to_rgb(np.stack([planes[0], planes[1], planes[2]], -1))
    mse = np.mean((rec_rgb.astype(np.float64) / 255 - img.astype(np.float64) / 255) ** 2)
    return num_bits / (h * w), -10 * math.log10(max(mse, 1e-12))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('-n', '--dataset', type=str, default='kodak')
    parser.add_argument('-q', '--qps', type=int, nargs='+',
                        default=list(range(15, 51, 5)))
    parser.add_argument('-o', '--output', type=str, required=True)
    args = parser.parse_args()

    from lvae_tpu.paths import known_datasets
    root = known_datasets.get(args.dataset, Path(args.dataset))
    img_paths = sorted(Path(root).rglob('*.*'))

    results = {'bpp': [], 'psnr': []}
    for qp in args.qps:
        bpps, psnrs = [], []
        for p in img_paths:
            bpp, psnr = vtm_encode_decode(p, qp)
            bpps.append(bpp)
            psnrs.append(psnr)
        results['bpp'].append(float(np.mean(bpps)))
        results['psnr'].append(float(np.mean(psnrs)))
        print(f'QP {qp}: bpp={results["bpp"][-1]:.4f} psnr={results["psnr"][-1]:.3f}')
    with open(args.output, 'w') as f:
        json.dump({'results': results, 'qps': args.qps}, f, indent=4)


if __name__ == '__main__':
    main()


def vtm_encode_decode_video(frame_paths, qp, max_frames=None):
    """Low-delay VTM round trip over an ordered frame sequence.
    Returns (bpp, psnr_rgb) averaged over frames."""
    enc = Path(VTM_BIN_DIR) / 'EncoderApp'
    dec = Path(VTM_BIN_DIR) / 'DecoderApp'
    assert enc.is_file() and dec.is_file(), \
        f'VTM binaries not found under VTM_BIN_DIR={VTM_BIN_DIR!r}'
    cfg = CFG_DIR / 'encoder_lowdelay_vtm.cfg'
    frame_paths = list(frame_paths)[:max_frames]
    frames = [np.asarray(Image.open(p).convert('RGB')) for p in frame_paths]
    h, w = frames[0].shape[:2]
    with tempfile.TemporaryDirectory() as td:
        td = Path(td)
        raw = td / 'in.yuv'
        with open(raw, 'wb') as f:
            for img in frames:
                yuv = rgb_to_yuv444(img)
                for c in range(3):
                    f.write(yuv[..., c].tobytes())
        bit, rec = td / 'out.bin', td / 'rec.yuv'
        subprocess.run([
            str(enc), '-c', str(cfg), '-i', str(raw), '-b', str(bit),
            '-o', os.devnull, '-wdt', str(w), '-hgt', str(h),
            '-q', str(qp), '-f', str(len(frames)), '-fr', '30',
            '--InputChromaFormat=444', '--InputBitDepth=8',
            '--ConformanceWindowMode=1',
        ], check=True, capture_output=True)
        subprocess.run([str(dec), '-b', str(bit), '-o', str(rec), '-d', '8'],
                       check=True, capture_output=True)
        num_bits = bit.stat().st_size * 8
        data = np.fromfile(rec, dtype=np.uint8).reshape(len(frames), 3, h, w)
    mses = []
    for img, planes in zip(frames, data):
        rec_rgb = yuv444_to_rgb(np.stack(list(planes), -1))
        mses.append(np.mean((rec_rgb.astype(np.float64) / 255 -
                             img.astype(np.float64) / 255) ** 2))
    psnr = float(np.mean([-10 * math.log10(max(m, 1e-12)) for m in mses]))
    return num_bits / (len(frames) * h * w), psnr
