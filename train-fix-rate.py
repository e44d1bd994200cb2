"""Fixed-rate training CLI (QRes-VAE family).

Flag names and defaults form the compatibility schema with the reference's
train-fix-rate.py (so launch commands port verbatim); everything else —
config assembly, wrapper, logging — is this repo's own. Evaluation is the
forward-only image_self_evaluate, as in the reference (:73-75).
"""
import argparse
import logging

from lvae_tpu.datasets import get_image_dateset
from lvae_tpu.evaluation import image_self_evaluate
from lvae_tpu.paths import known_datasets
from lvae_tpu.training.trainer import BaseTrainingWrapper

# (flag, type-or-action, default) — the reference CLI schema, grouped
_SCHEMA = {
    'wandb': [
        ('wbproject', str, 'qres'),
        ('wbentity', str, None),
        ('wbgroup', str, 'fix-rate-exp'),
        ('wbtags', '+', None),
        ('wbnote', str, None),
        ('wbmode', str, 'disabled'),
        ('name', str, None),
    ],
    'model': [
        ('model', str, 'qres34m'),
        ('model_args', str, 'lmb=32'),
    ],
    'resume': [
        ('resume', str, None),
        ('weights', str, None),
        ('load_optim', 'bool', False),
    ],
    'data': [
        ('trainset', str, 'coco-train2017'),
        ('transform', str, 'crop=256,hflip=True'),
        ('valset', str, 'kodak'),
    ],
    'optimization': [
        ('batch_size', int, 16),
        ('accum_num', int, 1),
        ('optimizer', str, 'adam'),
        ('lr', float, 2e-4),
        ('lr_sched', str, 'constant'),
        ('lrf_min', float, 0.01),
        ('lr_warmup', int, 1000),
        ('grad_clip', float, 2.0),
        ('iterations', int, 800_000),
        ('eval_first', 'bool', False),
    ],
    'ema': [
        ('ema', 'bool', True),
        ('ema_decay', float, 0.9999),
        ('ema_warmup', int, 10_000),
    ],
    'runtime': [
        ('fixseed', 'bool', True),
        ('amp', 'bool', False),   # bf16 compute (TPU analog of torch AMP)
        ('remat', 'bool', False),  # per-block gradient rematerialization
        ('workers', int, 6),
        ('data_cache', 'bool', False),  # pre-decode trainset to a raw uint8 blob
        ('device_data', 'bool', False),  # whole uint8 trainset device-resident
        ('probe_device_step', 'bool', False),
        ('val_interval', int, 2000),
    ],
}

# fixed post-parse settings, matching reference train-fix-rate.py:52-58
_FIXED = dict(wdecay=0.0, wandb_log_interval=100,
              model_log_interval=2000)


def build_config(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    for group, entries in _SCHEMA.items():
        g = ap.add_argument_group(group)
        for flag, kind, default in entries:
            if kind == 'bool':
                g.add_argument(f'--{flag}', default=default,
                               action=argparse.BooleanOptionalAction)
            elif kind == '+':
                g.add_argument(f'--{flag}', type=str, nargs='+',
                               default=default)
            else:
                g.add_argument(f'--{flag}', type=kind, default=default)
    cfg = ap.parse_args(argv)
    for k, v in _FIXED.items():
        setattr(cfg, k, v)
    cfg.model_val_interval = cfg.val_interval
    return cfg


class FixRateTrainer(BaseTrainingWrapper):
    def set_dataset(self):
        cfg = self.cfg
        trainset = get_image_dateset(cfg.trainset, transform_cfg=cfg.transform,
                                     decode_cache=getattr(cfg, 'data_cache', False))
        self.make_training_loader(trainset)
        logging.info(f'train: {trainset.root} ({len(trainset)} images, '
                     f'{trainset.transform}); '
                     f'val: {known_datasets.get(cfg.valset, cfg.valset)}')

    def eval_model(self, model) -> dict:
        return image_self_evaluate(model, self.cfg.valset, progress=False)


if __name__ == '__main__':
    FixRateTrainer(build_config()).main()
