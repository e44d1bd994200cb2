"""FLOPs / cost estimation via XLA's compiled cost analysis.

TPU-native replacement for the reference's three torch profilers
(scripts/qresvae/estimate-flops.ipynb; torch.profiler/thop/ptflops):
`jitted.lower().compile().cost_analysis()` reports the compiler's own FLOP
and byte-traffic estimates for the exact program that runs.
"""
import argparse
import json

import jax
import jax.numpy as jnp

from lvae_tpu.registry import get_model
from lvae_tpu.training.trainer import parse_model_args


def analyze(fn, *args):
    compiled = jax.jit(fn).lower(*args).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    return {
        'flops': cost.get('flops', float('nan')),
        'bytes_accessed': cost.get('bytes accessed', float('nan')),
    }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('-m', '--model', type=str, default='qarv_base')
    parser.add_argument('-a', '--model_args', type=str, default='')
    parser.add_argument('--hw', type=int, nargs=2, default=[512, 768])
    args = parser.parse_args()

    model = get_model(args.model, **parse_model_args(args.model_args))
    H, W = args.hw
    im = jnp.zeros((1, H, W, 3), jnp.float32)
    rng = jax.random.PRNGKey(0)

    def fwd(params, im):
        loss, stats = model.loss_and_stats(params, im, rng, training=False)
        return loss

    result = {'model': args.model, 'input_hw': [H, W],
              'params_M': round(model.num_params() / 1e6, 3)}
    c = analyze(fwd, model.params, im)
    result['forward'] = {k: (v / 1e9 if v == v else None) for k, v in c.items()}
    result['forward']['unit'] = 'G'
    print(json.dumps(result, indent=2))


if __name__ == '__main__':
    main()
