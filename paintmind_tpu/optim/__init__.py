from .lr_scheduler import build_schedule  # noqa: F401
from .optimizers import adam, adamw, lion  # noqa: F401
