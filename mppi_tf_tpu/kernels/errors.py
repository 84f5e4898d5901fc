"""Dedicated exception for kernel-eligibility failures.

The controller factories ("auto" kernel selection) probe the fused kernel
constructors and fall back to the XLA path when a model/cost pair is
unsupported. A dedicated subclass keeps that probe from swallowing genuine
``TypeError``s (bad kwargs after a refactor would otherwise silently select
the slower path).
"""


class KernelUnsupportedError(TypeError):
    """Raised by fused-kernel constructors for unsupported model/cost/option
    combinations. Subclasses TypeError for backwards compatibility with
    callers that catch the generic type."""
