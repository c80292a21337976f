from . import core, attention, mlp, transformer  # noqa: F401
