"""Rate targeting: binary search over lambda (in log space) to hit a target
compressed size within +-1 byte (reference: scripts/qarv/test-at-target-bytes.py:17-75).
"""
import argparse
import math
from pathlib import Path
from tempfile import gettempdir

from lvae_tpu.registry import get_model
from lvae_tpu.training.trainer import parse_model_args


def compress_size(model, img_path, lmb, tmp):
    model.compress_file(img_path, tmp, lmb=lmb)
    return tmp.stat().st_size


def search_lambda(model, img_path, target_bytes, tol=1, max_iter=30):
    lo, hi = model.lmb_range
    log_lo, log_hi = math.log(lo), math.log(hi)
    tmp = Path(gettempdir()) / 'target.bits'
    n_lo = compress_size(model, img_path, lo, tmp)
    n_hi = compress_size(model, img_path, hi, tmp)
    assert n_lo <= target_bytes <= n_hi, \
        f'target {target_bytes} outside achievable range [{n_lo}, {n_hi}]'
    best = (None, None)
    for _ in range(max_iter):
        mid = math.exp((log_lo + log_hi) / 2)
        n = compress_size(model, img_path, mid, tmp)
        best = (mid, n)
        if abs(n - target_bytes) <= tol:
            break
        if n < target_bytes:
            log_lo = math.log(mid)
        else:
            log_hi = math.log(mid)
    return best


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('-m', '--model', type=str, default='qarv_base')
    parser.add_argument('-a', '--model_args', type=str, default='')
    parser.add_argument('-i', '--image', type=str, required=True)
    parser.add_argument('-t', '--target_bytes', type=int, required=True)
    args = parser.parse_args()

    model = get_model(args.model, **parse_model_args(args.model_args))
    model.compress_mode()
    lmb, n = search_lambda(model, args.image, args.target_bytes)
    print(f'lambda = {lmb:.4f} -> {n} bytes (target {args.target_bytes})')


if __name__ == '__main__':
    main()
