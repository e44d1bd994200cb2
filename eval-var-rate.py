"""Variable-rate evaluation CLI (reference: eval-var-rate.py:13-69).

One model, lambdas log-spaced over its range, true-coding evaluation,
json dump with platform info.
"""
import argparse
import json
import math
import platform
from collections import defaultdict, OrderedDict
from pathlib import Path

import numpy as np

from lvae_tpu.registry import get_model
from lvae_tpu.evaluation import imcoding_evaluate
from lvae_tpu.training.trainer import parse_model_args


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('-m', '--model',        type=str, default='qarv_base')
    parser.add_argument('-a', '--model_args',   type=str, default='')
    parser.add_argument('-w', '--weights',      type=str, default=None)
    parser.add_argument('-l', '--lmb_range',    type=float, default=[16, 2048], nargs='+')
    parser.add_argument('-s', '--steps',        type=int, default=16)
    parser.add_argument('-n', '--dataset_name', type=str, default='kodak')
    # pad images to <=N shape buckets (bounds XLA compile count on
    # mixed-shape datasets like CLIC); default: exact /stride padding
    parser.add_argument('-b', '--shape_buckets', type=int, default=None)
    # BD-rate anchor curve; default auto-discovers the committed VTM anchor
    # for the dataset (results/{set}/{set}-vtm18.0.json) when present
    parser.add_argument('--bd_anchor', type=str, default='auto')
    args = parser.parse_args()

    kwargs = parse_model_args(args.model_args)
    if args.weights:
        kwargs['pretrained'] = args.weights
    model = get_model(args.model, **kwargs)
    model.compress_mode()

    start, end = args.lmb_range
    lambdas = np.exp(np.linspace(math.log(start), math.log(end), args.steps)).tolist()

    # --dataset_name may be a filesystem path (ad-hoc image dirs); key the
    # result file by its basename so the output never nests under
    # runs/results/<path>/ (the reference keys results by known dataset
    # names, lvae/evaluation.py:15-67)
    dataset_key = Path(args.dataset_name).name or args.dataset_name
    save_json_path = Path(f'runs/results/{dataset_key}-{args.model}.json')
    save_json_path.parent.mkdir(parents=True, exist_ok=True)

    all_lmb_stats = defaultdict(list)
    for lmb in lambdas:
        model.default_lmb = lmb
        results = imcoding_evaluate(model, args.dataset_name,
                                    shape_buckets=args.shape_buckets)
        print(f'lmb={lmb:.2f}: {results}')
        for k, v in results.items():
            all_lmb_stats[k].append(v)

    import jax
    json_data = OrderedDict()
    json_data['name'] = args.model
    json_data['test-set'] = args.dataset_name
    json_data['platform'] = platform.platform()
    json_data['device'] = str(jax.devices()[0])
    json_data['lambdas'] = lambdas
    json_data['results'] = all_lmb_stats
    # BD-rate vs the anchor curve (reference computes this in notebooks via
    # RDList; here it is part of the eval run so the number is on record)
    anchor = args.bd_anchor
    if anchor == 'auto':
        cand = Path(f'results/{dataset_key}/{dataset_key}-vtm18.0.json')
        anchor = str(cand) if cand.exists() else None
    if anchor:
        from lvae_tpu.utils.coding import RDList
        rd = RDList()
        rd.add_json(anchor, label=Path(anchor).stem)
        rd.add_data(bpp=all_lmb_stats['bpp'], psnr=all_lmb_stats['psnr'],
                    label=args.model)
        rd.set_bdrate_anchor(Path(anchor).stem)
        json_data['bd-rate'] = rd.compute_bdrate()

    with open(save_json_path, 'w') as f:
        json.dump(json_data, fp=f, indent=4)
    print(f'\nSaved results to {save_json_path}\n')
    for k, vlist in all_lmb_stats.items():
        print(f'{k:<6s} = [' + ', '.join(f'{v:.12f}'[:7] for v in vlist) + ']')


if __name__ == '__main__':
    main()
