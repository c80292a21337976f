"""Production-serving tier (extension; the reference has no serving story).

``GenerationEngine`` batches concurrent requests onto the TPU;
``server.serve`` exposes it over stdlib HTTP.  See ``scripts/serve.py``.
"""

from .engine import (EngineOverloaded, GenerateRequest, GenerationEngine,
                     PaintRequest, ReconstructRequest)
from .server import make_server, serve

__all__ = ['GenerationEngine', 'GenerateRequest', 'PaintRequest',
           'ReconstructRequest', 'EngineOverloaded', 'make_server', 'serve']
