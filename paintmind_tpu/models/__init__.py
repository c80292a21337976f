from .vqmodel import VQModel  # noqa: F401


def __getattr__(name):  # lazy: Pipeline pulls in the factory import chain
    if name == 'Pipeline':
        from .pipeline import Pipeline
        return Pipeline
    raise AttributeError(name)
