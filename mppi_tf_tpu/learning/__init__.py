from .replay import ReplayBuffer
from .learner import Learner

__all__ = ["ReplayBuffer", "Learner", "get_learner"]


def get_learner(model, **kwargs):
    """Factory passthrough. Reference: scripts/src/learner.py:1-18."""
    return Learner(model, **kwargs)
