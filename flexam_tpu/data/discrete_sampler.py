"""SP-aware group-uniform diffusion-timestep sampling.

Behavioral reference: `FlexAM/utils/discrete_sampler.py:5-52`
(`DiscreteSampling`): the world is split into `group_num` groups; every
rank in a sequence-parallel group samples timesteps from the same sigma
interval, so SP shards of one sample train on one timestep.

TPU-native: no torch.distributed — the mesh topology is explicit
(world_size, rank, sp_size args) and randomness is jax.random.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


class DiscreteSampling:
    def __init__(self, num_idx: int, uniform_sampling: bool = False,
                 start_num_idx: int = 0, sp_size: int = 1,
                 world_size: int = 1, rank: int = 0):
        self.num_idx = num_idx
        self.start_num_idx = start_num_idx
        self.uniform_sampling = uniform_sampling and world_size > 1
        self.rank = rank
        if self.uniform_sampling:
            i = 1
            while True:
                if world_size % i != 0 or num_idx % (world_size // i) != 0:
                    i += 1
                    continue
                if i >= sp_size:
                    self.group_num = world_size // i
                elif sp_size > world_size:
                    self.group_num = 1
                else:
                    self.group_num = world_size // sp_size
                break
            assert self.group_num > 0
            assert world_size % self.group_num == 0
            self.group_width = world_size // self.group_num
            self.sigma_interval = self.num_idx // self.group_num

    def __call__(self, n_samples: int, key: jax.Array) -> jnp.ndarray:
        if self.uniform_sampling:
            group_index = self.rank // self.group_width
            lo = self.start_num_idx + group_index * self.sigma_interval
            hi = self.start_num_idx + (group_index + 1) * self.sigma_interval
        else:
            lo = self.start_num_idx
            hi = self.start_num_idx + self.num_idx
        return jax.random.randint(key, (n_samples,), lo, hi)
