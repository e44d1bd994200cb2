"""Export a training run's EMA parameters to a flat msgpack weights file.

The trainer checkpoints the FULL TrainState (params + Adam moments +
ema_params) via orbax; inference/benchmark scripts want just the EMA
weights in the flax.serialization flat format that
VAEModelBase.load_weights reads. This regenerates e.g.
runs/qarv_base_synth6k_ema.msgpack after a (re)training run — the file is
too large to commit, so it must be reproducible from a run dir.

Usage:
    python scripts/export-ema.py --run_dir runs/default/<name> \
        --model qarv_base --out runs/qarv_base_synth6k_ema.msgpack
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--run_dir', required=True,
                    help='training run dir containing last/last_ema ckpts')
    ap.add_argument('--ckpt', default='last_ema',
                    help='checkpoint subdir name (last, last_ema, best_ema)')
    ap.add_argument('--model', default='qarv_base')
    ap.add_argument('--out', required=True)
    args = ap.parse_args()

    import jax
    jax.config.update('jax_platforms', 'cpu')  # export is pure host IO
    import lvae_tpu
    from lvae_tpu.training import checkpoint as ckpt
    from lvae_tpu.training.optim import create_train_state

    model = lvae_tpu.get_model(args.model)
    state, _ = create_train_state(model.params, optimizer='adam', ema=True)
    template = {'state': state, 'iter': 0, 'epoch': 0.0, 'best_loss': 0.0}
    payload = ckpt.load_checkpoint(Path(args.run_dir) / args.ckpt, template)
    st = payload['state']
    params = st.ema_params if getattr(st, 'ema_params', None) is not None \
        else st.params
    model.load_state_dict(params)
    model.save_weights(args.out)
    n = sum(int(p.size) for p in jax.tree.leaves(params))
    print(f'exported {n / 1e6:.2f}M params (iter {payload["iter"]}) '
          f'-> {args.out}')


if __name__ == '__main__':
    main()
