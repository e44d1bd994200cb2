"""Fixed-rate evaluation CLI (reference: eval-fix-rate.py:11-59).

Loads one model per lambda in {16..2048}, true-bitstream evaluates, and
dumps runs/results/{dataset}-{model}.json.
"""
import argparse
import json
from collections import defaultdict, OrderedDict
from pathlib import Path

from lvae_tpu.registry import get_model
from lvae_tpu.evaluation import imcoding_evaluate
from lvae_tpu.training.trainer import parse_model_args


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('-m', '--model',        type=str, default='qres34m')
    parser.add_argument('-a', '--model_args',   type=str, default='')
    parser.add_argument('-l', '--lmbs',         type=int, nargs='+',
                        default=[16, 32, 64, 128, 256, 512, 1024, 2048])
    parser.add_argument('-w', '--weights',      type=str, default=None,
                        help='weight file pattern with {lmb} placeholder')
    parser.add_argument('-n', '--dataset_name', type=str, default='kodak')
    # pad images to <=N shape buckets (bounds XLA compile count on
    # mixed-shape datasets like CLIC); default: exact /stride padding
    parser.add_argument('-b', '--shape_buckets', type=int, default=None)
    args = parser.parse_args()

    save_json_path = Path(f'runs/results/{args.dataset_name}-{args.model}.json')
    save_json_path.parent.mkdir(parents=True, exist_ok=True)

    all_lmb_stats = defaultdict(list)
    for lmb in args.lmbs:
        kwargs = parse_model_args(args.model_args)
        kwargs['lmb'] = lmb
        if args.weights:
            kwargs['pretrained'] = args.weights.format(lmb=lmb)
        model = get_model(args.model, **kwargs)
        model.compress_mode()
        results = imcoding_evaluate(model, args.dataset_name,
                                    shape_buckets=args.shape_buckets)
        print(f'lmb={lmb}: {results}')
        for k, v in results.items():
            all_lmb_stats[k].append(v)

    json_data = OrderedDict()
    json_data['name'] = args.model
    json_data['test-set'] = args.dataset_name
    json_data['lambdas'] = args.lmbs
    json_data['results'] = all_lmb_stats
    with open(save_json_path, 'w') as f:
        json.dump(json_data, fp=f, indent=4)
    print(f'Saved results to {save_json_path}')
    for k, vlist in all_lmb_stats.items():
        print(f'{k:<6s} = [' + ', '.join(f'{v:.12f}'[:7] for v in vlist) + ']')


if __name__ == '__main__':
    main()
