"""Model registry: decorator-based name -> factory mapping.

Mirrors the reference registry (reference: lvae/models/registry.py:4-15) —
the registry-of-factory-functions pattern is kept because model architecture
"config" in this domain is genuinely best expressed as code (block lists).
"""

_all_models = {}


def register_model(func):
    name = func.__name__
    if name in _all_models:
        print(f'[93mWarning: model function *{name}* is multiply defined.[0m')
    _all_models[name] = func
    return func


def get_model(name, *args, **kwargs):
    """Build a registered model by name.

    Returns whatever the factory returns — for this framework that is a
    `(module, variables)`-style model handle (see lvae_tpu.models.base.Model).
    """
    if name not in _all_models:
        raise KeyError(f'Unknown model "{name}". Available: {sorted(_all_models)}')
    return _all_models[name](*args, **kwargs)


def list_models():
    return sorted(_all_models.keys())
