from .vqmodel import VQModel  # noqa: F401
