"""Model factory (reference: paintmind/factory.py:6-26).

``create_model(arch, version, pretrained, checkpoint_path)`` builds a
VQModel or Pipeline from the ``ver2cfg`` registry; pretrained weights load
from a local checkpoint (.pt reference format, .npz, or orbax dir) or — when
the environment has network access — from the published HF hub repo
``RootYuan/<version>`` exactly like the reference (factory.py:18).
"""

from __future__ import annotations

from .config import Config, ver2cfg


def _hub_download(version):
    from huggingface_hub import hf_hub_download
    return hf_hub_download('RootYuan/' + version, f'{version}.pt')


def create_model(arch='pipeline', version='paintmindv1', pretrained=True,
                 checkpoint_path=None, **kwargs):
    config = Config(ver2cfg[version])

    if arch == 'vqgan':
        from .models.vqmodel import VQModel
        model = VQModel(config, **kwargs)
    elif arch == 'pipeline':
        from .models.pipeline import Pipeline
        model = Pipeline(config, stage1_pretrained=False, **kwargs)
    else:
        raise ValueError(f"unknown arch {arch!r}; expected 'vqgan' or 'pipeline'")

    # An explicit local checkpoint_path always loads — silently ignoring it
    # when pretrained=False was a footgun (callers built random-weight
    # models believing their checkpoint was in use).  `pretrained` keeps
    # its reference meaning: fetch the published weights when no local
    # path is given (reference factory.py:16-19).
    if checkpoint_path is not None:
        model.from_pretrained(checkpoint_path)
    elif pretrained:
        model.from_pretrained(_hub_download(version))

    return model


def create_pipeline_for_train(version='paintmindv1', stage1_pretrained=True,
                              stage1_checkpoint_path=None, **kwargs):
    from .models.pipeline import Pipeline
    return Pipeline(Config(ver2cfg[version]), stage1_pretrained=stage1_pretrained,
                    stage1_checkpoint_path=stage1_checkpoint_path, **kwargs)
