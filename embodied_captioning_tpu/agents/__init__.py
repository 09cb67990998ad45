"""Agent trainers. Importing the subpackage populates the trainer registry."""

from . import baselines  # noqa: F401
from . import goal_exploration  # noqa: F401
from . import extra_trainers  # noqa: F401
from . import ddppo  # noqa: F401
from .registry import get_trainer, list_trainers  # noqa: F401
