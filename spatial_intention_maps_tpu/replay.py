"""Device-resident ring replay buffer.

TPU-native replacement for the pickled Python list buffer (train.py:28-45):
preallocated HBM arrays with scatter writes and uniform gather sampling, one
buffer per robot group (train.py:192-195).  States are stored in bfloat16
(values are bounded map floats) to halve HBM traffic.
"""

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

from . import constants

N = constants.LOCAL_MAP_PIXEL_WIDTH


@struct.dataclass
class ReplayBuffer:
    states: jnp.ndarray       # (cap, N, N, C) storage dtype
    actions: jnp.ndarray      # (cap,) int32
    rewards: jnp.ndarray      # (cap,) float32
    next_states: jnp.ndarray  # (cap, N, N, C)
    has_next: jnp.ndarray     # (cap,) bool (False for terminal transitions)
    position: jnp.ndarray     # int32 ring cursor
    size: jnp.ndarray         # int32 current fill

    @classmethod
    def create(cls, capacity: int, num_channels: int, dtype=jnp.bfloat16):
        z = lambda *s, d=dtype: jnp.zeros(s, d)
        return cls(
            states=z(capacity, N, N, num_channels),
            actions=jnp.zeros(capacity, jnp.int32),
            rewards=jnp.zeros(capacity, jnp.float32),
            next_states=z(capacity, N, N, num_channels),
            has_next=jnp.zeros(capacity, bool),
            position=jnp.int32(0),
            size=jnp.int32(0),
        )

    @property
    def capacity(self) -> int:
        return self.states.shape[0]

    def push(self, state, action, reward, next_state, has_next, mask):
        """Scatter a batch of transitions at the ring cursor.

        All args are batched (M, ...); ``mask`` (M,) selects real entries.
        Masked-out rows do not advance the cursor.
        """
        m = mask.shape[0]
        offsets = jnp.cumsum(mask.astype(jnp.int32)) - 1
        idx = (self.position + offsets) % self.capacity
        # Masked rows write to a scratch slot we overwrite right after: route
        # them to the *current* cursor slot and write valid rows last by
        # sorting (valid rows have increasing offsets, invalid collapse).
        idx = jnp.where(mask, idx, self.capacity)  # out-of-range = dropped
        count = jnp.sum(mask.astype(jnp.int32))

        def scat(buf, val):
            return buf.at[idx].set(val.astype(buf.dtype), mode="drop")

        return self.replace(
            states=scat(self.states, state),
            actions=scat(self.actions, action),
            rewards=scat(self.rewards, reward),
            next_states=scat(self.next_states, next_state),
            has_next=scat(self.has_next, has_next),
            position=(self.position + count) % self.capacity,
            size=jnp.minimum(self.size + count, self.capacity),
        )

    def sample(self, key, batch_size: int):
        """Uniform sample of ``batch_size`` transitions (train.py:41-43).

        Sampling an empty buffer would silently return the zero-initialized
        row 0; callers inside jit must gate on ``size`` themselves (the
        trainer's warm gate does), but eager callers fail loudly here.
        """
        if not isinstance(self.size, jax.core.Tracer) and int(self.size) < 1:
            raise ValueError("ReplayBuffer.sample on an empty buffer")
        idx = jax.random.randint(key, (batch_size,), 0, jnp.maximum(self.size, 1))
        return dict(
            state=self.states[idx].astype(jnp.float32),
            action=self.actions[idx],
            reward=self.rewards[idx],
            next_state=self.next_states[idx].astype(jnp.float32),
            has_next=self.has_next[idx],
        )
