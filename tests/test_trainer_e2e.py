"""Trainer END-TO-END: TrainWrapper(cfg).main() + resume, through the real
CLI wrapper class (not just the step function) — catches integration rot
like evaluate()/checkpoint/resume wiring (reference behavior:
trainer.py:46-67, 254-282)."""
import argparse
import importlib.util
import os
import sys

import numpy as np
import pytest
from PIL import Image

_REPO = os.path.dirname(os.path.dirname(__file__))


def _load_cli(name):
    spec = importlib.util.spec_from_file_location(
        name.replace('-', '_'), os.path.join(_REPO, name + '.py'))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope='module')
def tiny_dataset(tmp_path_factory):
    d = tmp_path_factory.mktemp('imgs')
    rng = np.random.default_rng(0)
    for i in range(4):
        arr = (rng.uniform(0, 1, (80, 80, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(d / f'{i}.png')
    return str(d)


def _cfg(cli, tiny_dataset, **over):
    argv = ['--model', 'qres_tiny', '--model_args', 'lmb=64',
            '--trainset', tiny_dataset, '--valset', tiny_dataset,
            '--transform', 'crop=64,hflip=True',
            '--batch_size', '8', '--workers', '1',
            '--iterations', '14', '--lr', '1e-3', '--name', 'e2e']
    for k, v in over.items():
        argv += [f'--{k}', str(v)]
    cfg = cli.build_config(argv)
    cfg.model_val_interval = 6          # eval + checkpoint fire mid-run
    cfg.model_log_interval = 10_000     # skip study() image dumps
    return cfg


def test_train_main_and_resume(tiny_dataset, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)         # trainer writes ./runs/...
    cli = _load_cli('train-fix-rate')

    w = cli.FixRateTrainer(_cfg(cli, tiny_dataset))
    w.main()
    assert w._cur_iter >= 13
    run_dir = tmp_path / 'runs' / w.cfg.wbproject / 'e2e'
    assert (run_dir / 'config.json').is_file()
    assert (run_dir / 'model.txt').is_file()
    assert (run_dir / 'results.txt').is_file()
    assert (run_dir / 'last').exists(), 'last checkpoint missing'
    assert (run_dir / 'best').exists()
    assert w._results, 'evaluate() never populated results'

    # --- resume: iteration counter and optimizer state restored -----------
    w2 = cli.FixRateTrainer(_cfg(cli, tiny_dataset, resume='e2e',
                                 iterations=20))
    w2.main()
    assert w2._cur_iter >= 19
    # resumed run starts where the first left off (not from zero)
    import jax
    s1 = jax.device_get(w.state)
    s2 = jax.device_get(w2.state)
    assert int(s2.step) > int(s1.step) - 1
    # Adam moments restored: second-moment tree is nonzero after resume
    mom = jax.tree_util.tree_leaves(s2.opt_state)
    assert any(float(np.abs(np.asarray(x)).max()) > 0 for x in mom)
