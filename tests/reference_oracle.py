"""Import machinery for using the PyTorch reference as a golden test oracle.

The reference package's top-level ``__init__`` pulls in heavy/absent deps
(kornia, open_clip, torchvision), so we register a stub ``paintmind`` parent
package pointing at the reference tree and import only the torch-importable
submodules (stage1/stage2/modules/optim) directly.  The reference is invoked,
never copied.
"""

from __future__ import annotations

import importlib
import sys
import types

REF_ROOT = '/root/reference/paintmind'


def _ensure_stub_package():
    if 'paintmind' in sys.modules:
        return
    pkg = types.ModuleType('paintmind')
    pkg.__path__ = [REF_ROOT]
    sys.modules['paintmind'] = pkg


def ref_module(name):
    """e.g. ref_module('stage1.vqmodel')"""
    _ensure_stub_package()
    return importlib.import_module(f'paintmind.{name}')


def torch_state_dict_to_numpy(module):
    return {k: v.detach().cpu().numpy() for k, v in module.state_dict().items()}
