"""Gym-style compatibility layer (SURVEY.md §7.1 step 7): the reference's
mutable single-env API as a shell over the pure-functional core."""

from .gym_env import GridUniverseEnv
from .spaces import Discrete
