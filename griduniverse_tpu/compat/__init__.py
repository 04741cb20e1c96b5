"""Gym-style compatibility layer (SURVEY.md §7.1 step 7): the reference's
mutable single-env API as a shell over the pure-functional core."""

from .gym_env import GridUniverseEnv
from .gymnasium_env import ENV_ID, GridUniverseGymnasiumEnv, register_envs
from .spaces import Discrete
from .vector_env import VectorGridEnv
