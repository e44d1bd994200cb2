"""QARV forward-only (theoretical bpp) evaluation across datasets
(reference: scripts/qarv/eval-theoretical.py:8-35).
"""
import argparse
import json
from pathlib import Path

from lvae_tpu.registry import get_model
from lvae_tpu.paths import known_datasets
from lvae_tpu.training.trainer import parse_model_args


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('-m', '--model', type=str, default='qarv_base')
    parser.add_argument('-a', '--model_args', type=str, default='')
    parser.add_argument('-n', '--datasets', type=str, nargs='+', default=['kodak'])
    parser.add_argument('-s', '--steps', type=int, default=8)
    args = parser.parse_args()

    model = get_model(args.model, **parse_model_args(args.model_args))
    for name in args.datasets:
        root = known_datasets.get(name, Path(name))
        results = model.self_evaluate(root, steps=args.steps)
        print(f'==== {name} ====')
        print(json.dumps(results, indent=2))


if __name__ == '__main__':
    main()
