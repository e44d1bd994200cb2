"""RD-model theoretical evaluation (reference: lvae/models/rd/evaluate.py:18-106).

bpp = sum(KL) * log2(e) / (H*W); no entropy coding since latents are
continuous.
"""
import argparse
import json
import math
from collections import defaultdict, OrderedDict
from pathlib import Path

import numpy as np

from lvae_tpu.registry import get_model
from lvae_tpu.paths import known_datasets


def evaluate_model(model, dataset_name, steps=8, lmb_range=None):
    root = known_datasets.get(dataset_name, Path(dataset_name))
    return model.self_evaluate(root, lmb_range=lmb_range, steps=steps)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('-m', '--model', type=str, default='rd_model_base')
    parser.add_argument('-a', '--model_args', type=str, default='')
    parser.add_argument('-n', '--datasets', type=str, nargs='+',
                        default=['kodak'])
    parser.add_argument('-s', '--steps', type=int, default=8)
    args = parser.parse_args()

    from lvae_tpu.training.trainer import parse_model_args
    model = get_model(args.model, **parse_model_args(args.model_args))

    for name in args.datasets:
        results = evaluate_model(model, name, steps=args.steps)
        save_path = Path(f'runs/results/{name}-{args.model}.json')
        save_path.parent.mkdir(parents=True, exist_ok=True)
        data = OrderedDict(name=args.model, dataset=name, results=results)
        with open(save_path, 'w') as f:
            json.dump(data, f, indent=4)
        print(f'{name}: {results}')


if __name__ == '__main__':
    main()
