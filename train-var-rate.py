"""Variable-rate training CLI (QARV / RD families).

Mirrors reference train-var-rate.py — same flags/defaults; validation runs
the lambda-sweep self_evaluate and reports BD-rate vs the committed VTM 18.0
anchors as the model-selection loss (reference: train-var-rate.py:79-169).
"""
import argparse
import json
import logging
from pathlib import Path

from lvae_tpu.paths import known_datasets
from lvae_tpu.training.trainer import BaseTrainingWrapper
from lvae_tpu.datasets import get_image_dateset
from lvae_tpu.utils.coding import bd_rate


def parse_args():
    parser = argparse.ArgumentParser()
    # wandb setting
    parser.add_argument('--wbproject',  type=str, default='default')
    parser.add_argument('--wbentity',   type=str, default=None)
    parser.add_argument('--wbgroup',    type=str, default='var-rate-exp')
    parser.add_argument('--wbtags',     type=str, default=None, nargs='+')
    parser.add_argument('--wbnote',     type=str, default=None)
    parser.add_argument('--wbmode',     type=str, default='disabled')
    parser.add_argument('--name',       type=str, default=None)
    # model setting
    parser.add_argument('--model',      type=str, default='qarv_base')
    parser.add_argument('--model_args', type=str, default='')
    # resume setting
    parser.add_argument('--resume',     type=str, default=None)
    parser.add_argument('--weights',    type=str, default=None)
    parser.add_argument('--load_optim', action=argparse.BooleanOptionalAction, default=False)
    # data setting
    parser.add_argument('--trainset',   type=str, default='coco-train2017')
    parser.add_argument('--transform',  type=str, default='crop=256,hflip=True')
    parser.add_argument('--valset',     type=str, default='kodak')
    parser.add_argument('--val_steps',  type=int, default=8)
    # optimization setting
    parser.add_argument('--batch_size', type=int, default=16)
    parser.add_argument('--accum_num',  type=int, default=1)
    parser.add_argument('--optimizer',  type=str, default='adam')
    parser.add_argument('--lr',         type=float, default=2e-4)
    parser.add_argument('--lr_sched',   type=str, default='const-0.5-cos')
    parser.add_argument('--lrf_min',    type=float, default=0.01)
    parser.add_argument('--lr_warmup',  type=int, default=0)
    parser.add_argument('--grad_clip',  type=float, default=2.0)
    # training iterations setting
    parser.add_argument('--iterations', type=int, default=2_000_000)
    parser.add_argument('--eval_first', action=argparse.BooleanOptionalAction, default=False)
    # exponential moving averaging (EMA)
    parser.add_argument('--ema',        action=argparse.BooleanOptionalAction, default=True)
    parser.add_argument('--ema_decay',  type=float, default=0.9999)
    parser.add_argument('--ema_warmup', type=int, default=10_000)
    # device setting
    parser.add_argument('--fixseed',    action=argparse.BooleanOptionalAction, default=True)
    # bf16 mixed-precision compute (TPU analog of the reference's --amp)
    parser.add_argument('--amp',        action=argparse.BooleanOptionalAction, default=False)
    # per-block gradient rematerialization (larger per-chip batches)
    parser.add_argument('--remat',      action=argparse.BooleanOptionalAction, default=False)
    parser.add_argument('--workers',    type=int, default=6)
    parser.add_argument('--data_cache', action=argparse.BooleanOptionalAction, default=False)
    # whole uint8 trainset resident in device memory (single-process runs)
    parser.add_argument('--device_data', action=argparse.BooleanOptionalAction, default=False)
    parser.add_argument('--probe_device_step', action=argparse.BooleanOptionalAction, default=False)
    parser.add_argument('--val_interval', type=int, default=2000)
    cfg = parser.parse_args()

    cfg.wdecay = 0.0
    cfg.wandb_log_interval = 100
    cfg.model_log_interval = 2000
    cfg.model_val_interval = cfg.val_interval
    return cfg


def read_rd_stats_from_json(json_path):
    with open(json_path, mode='r') as f:
        stats = json.load(fp=f)
    assert isinstance(stats, dict)
    return stats.get('results', stats)


def get_anchor_stats(dataset_name):
    """Committed VTM 18.0 anchors (reference: train-var-rate.py:148-156)."""
    anchor_paths = {
        'kodak': 'results/kodak/kodak-vtm18.0.json',
        'tecnick-rgb-1200':
            'results/tecnick-rgb-1200/tecnick-rgb-1200-vtm18.0.json',
        'clic2022-test': 'results/clic2022-test/clic2022-test-vtm18.0.json',
    }
    return read_rd_stats_from_json(anchor_paths[dataset_name])


def compute_bd_rate_over_anchor(stats, dataset_name):
    anchor = get_anchor_stats(dataset_name)
    return bd_rate(anchor['bpp'], anchor['psnr'], stats['bpp'], stats['psnr'])


def process_log_results(results, dataset_name='kodak'):
    """(reference: train-var-rate.py:134-146)"""
    try:
        bdr = compute_bd_rate_over_anchor(results, dataset_name)
    except (FileNotFoundError, KeyError):
        bdr = float(results['loss'][len(results['loss']) // 2]) \
            if isinstance(results.get('loss'), list) else float('inf')
    lambdas = results['lambda']
    to_log = {'bd-rate': bdr}
    for idx in [0, len(lambdas) // 2, -1]:
        lmb = round(lambdas[idx])
        to_log.update({
            f'lmb{lmb}/loss': results['loss'][idx],
            f'lmb{lmb}/bpp': results['bpp'][idx],
            f'lmb{lmb}/psnr': results['psnr'][idx],
        })
    results['loss'] = bdr
    results['bd-rate'] = bdr
    return to_log


class TrainWrapper(BaseTrainingWrapper):
    def set_dataset(self):
        cfg = self.cfg
        logging.info('==== Datasets and Dataloaders ====')
        trainset = get_image_dateset(cfg.trainset, transform_cfg=cfg.transform,
                                     decode_cache=getattr(cfg, 'data_cache', False))
        self.make_training_loader(trainset)
        logging.info(f'Training root: {trainset.root}; N = {len(trainset)}')

    def eval_model(self, model) -> dict:
        cfg = self.cfg
        val_img_dir = known_datasets.get(cfg.valset, cfg.valset)
        results = model.self_evaluate(val_img_dir, steps=cfg.val_steps,
                                      log_dir=self._log_dir)
        process_log_results(results, cfg.valset)
        return results


def main():
    cfg = parse_args()
    TrainWrapper(cfg).main()


if __name__ == '__main__':
    main()
