from .shapes import assert_shape
from .blockdiag import block_diag

__all__ = ["assert_shape", "block_diag"]
