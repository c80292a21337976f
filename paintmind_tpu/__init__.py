"""paintmind_tpu — a TPU-native JAX rebuild of PaintMind.

Public API parity with the reference facade (paintmind/__init__.py:1-7):
``Config``, ``create_model``, ``create_pipeline_for_train``, ``VQGANTrainer``,
``PaintMindTrainer``, ``stage1_transform``, ``stage2_transform``,
``reconstruction``.

Heavy submodules (trainers, orbax, datasets) are imported lazily so that
``import paintmind_tpu as pm`` stays cheap.
"""

from .version import __version__
from .config import Config, ver2cfg

_LAZY = {
    'create_model': ('paintmind_tpu.factory', 'create_model'),
    'create_pipeline_for_train': ('paintmind_tpu.factory', 'create_pipeline_for_train'),
    'VQGANTrainer': ('paintmind_tpu.utils.trainer', 'VQGANTrainer'),
    'PaintMindTrainer': ('paintmind_tpu.utils.trainer', 'PaintMindTrainer'),
    'stage1_transform': ('paintmind_tpu.utils.transform', 'stage1_transform'),
    'stage2_transform': ('paintmind_tpu.utils.transform', 'stage2_transform'),
    'reconstruction': ('paintmind_tpu.reconstruct', 'reconstruction'),
    'VQModel': ('paintmind_tpu.models.vqmodel', 'VQModel'),
    'Pipeline': ('paintmind_tpu.models.pipeline', 'Pipeline'),
}

__all__ = ['Config', 'ver2cfg', '__version__'] + sorted(_LAZY)


def __getattr__(name):
    try:
        module_name, attr = _LAZY[name]
    except KeyError:
        raise AttributeError(f'module {__name__!r} has no attribute {name!r}')
    import importlib
    value = getattr(importlib.import_module(module_name), attr)
    globals()[name] = value
    return value


def __dir__():
    return __all__
