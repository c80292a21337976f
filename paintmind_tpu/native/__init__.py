"""Native (C++) host-side tier: JPEG decode + preprocess (fastimage).

Built lazily with make on first use; all callers fall back to the PIL path
when the toolchain or libjpeg is unavailable.
"""

from .fastimage import (batch_decode_preprocess, batch_preprocess_rgb,  # noqa: F401
                        is_available)
