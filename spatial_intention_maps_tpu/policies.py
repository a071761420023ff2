"""DQN policies (policies.py:11-146 equivalents), functional-first.

One FCN per robot *group* (heterogeneous teams use several nets,
policies.py:35-42).  Actions are flat indices over (C_out, 96, 96) in
channel-major order (torch ``view(1, -1)`` of CHW, policies.py:63,
tools_simple_gui.py:40).

The batched ``act`` runs every group's net on the full observation batch and
selects per-sample outputs by group id — wasteful by a factor of
``num_groups`` but fully static-shaped; group counts are 1-2 in practice.
"""

import dataclasses
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import constants
from .envs.types import EnvParams
from .models import FCN

N = constants.LOCAL_MAP_PIXEL_WIDTH


def action_space_size(num_output_channels: int) -> int:
    return num_output_channels * N * N  # envs.py:374-376


@dataclasses.dataclass
class DQNPolicy:
    """Container for per-group Q-nets (+ optional intention nets)."""

    env_params: EnvParams
    num_input_channels: int
    use_predicted_intention: bool = False
    compute_dtype: Any = jnp.float32
    # Reference ResNet-18 widths by default; reducible for tiny test configs.
    layer_planes: Optional[tuple] = None
    head_planes: Optional[tuple] = None

    def __post_init__(self):
        self.group_channels = self.env_params.num_output_channels
        self.num_groups = self.env_params.num_groups
        sizes = {}
        if self.layer_planes is not None:
            sizes["layer_planes"] = tuple(self.layer_planes)
        if self.head_planes is not None:
            sizes["head_planes"] = tuple(self.head_planes)
        self.models = [
            FCN(num_output_channels=c, dtype=self.compute_dtype, **sizes)
            for c in self.group_channels
        ]
        if self.use_predicted_intention:
            # Intention nets take the state minus the ground-truth intention
            # channel and predict it (policies.py:89-95).
            self.intention_models = [
                FCN(num_output_channels=1, dtype=self.compute_dtype, **sizes)
                for _ in range(self.num_groups)
            ]

    def init(self, key) -> Dict[str, List[Any]]:
        keys = jax.random.split(key, 2 * self.num_groups)
        dummy = jnp.zeros((1, N, N, self.num_input_channels), jnp.float32)
        variables = {"policy": [], "intention": []}
        for g in range(self.num_groups):
            variables["policy"].append(self.models[g].init(keys[g], dummy, train=False))
            if self.use_predicted_intention:
                dummy_i = dummy[..., :-1]
                variables["intention"].append(
                    self.intention_models[g].init(keys[self.num_groups + g], dummy_i, False)
                )
        return variables

    # ------------------------------------------------------------------
    def q_maps(self, variables, obs, train=False):
        """Per-group Q maps on the full batch: list of (B, 96, 96, C_g)."""
        outs = []
        for g in range(self.num_groups):
            out = self.models[g].apply(variables["policy"][g], obs, train=train)
            outs.append(out)
        return outs

    def predict_intention(self, variables, obs_without_gt, train=False):
        """Sigmoid intention maps per group: list of (B, 96, 96, 1)
        (policies.py:97-117)."""
        outs = []
        for g in range(self.num_groups):
            logits = self.intention_models[g].apply(
                variables["intention"][g], obs_without_gt, train=train
            )
            outs.append(jax.nn.sigmoid(logits))
        return outs

    def act(self, variables, obs, group_ids, eps, key, use_predicted_intention=None):
        """epsilon-greedy actions for a batch of observations.

        obs: (B, 96, 96, C); group_ids: (B,) int32.
        Returns (actions (B,) int32, q_selected (B, 96, 96, C_max)).
        """
        if use_predicted_intention is None:
            use_predicted_intention = self.use_predicted_intention
        if use_predicted_intention:
            # Training states carry the ground-truth intention as the last
            # channel: strip it and substitute the prediction
            # (policies.py:124-138).  Eval states come from an env WITHOUT
            # the intention map (predicted configs set use_intention_map
            # false) — append the prediction to the full state instead
            # (policies.py:119-131: the strip only happens when
            # ``self.train``).
            if obs.shape[-1] == self.num_input_channels:
                stripped = obs[..., :-1]
            else:
                assert obs.shape[-1] == self.num_input_channels - 1, obs.shape
                stripped = obs
            preds = self.predict_intention(variables, stripped)
            pred = _select_by_group(preds, group_ids)
            obs = jnp.concatenate([stripped, pred], axis=-1)

        qmaps = self.q_maps(variables, obs)
        b = obs.shape[0]
        c_max = max(self.group_channels)
        padded = []
        for g, q in enumerate(qmaps):
            pad = c_max - q.shape[-1]
            if pad:
                q = jnp.concatenate(
                    [q, jnp.full(q.shape[:-1] + (pad,), -jnp.inf, q.dtype)], axis=-1
                )
            padded.append(q)
        q_sel = _select_by_group(padded, group_ids)  # (B, 96, 96, C_max)

        # Channel-major flat argmax (torch CHW view, policies.py:63).
        q_chw = jnp.transpose(q_sel, (0, 3, 1, 2)).reshape(b, -1)
        greedy = jnp.argmax(q_chw, axis=-1).astype(jnp.int32)

        k1, k2 = jax.random.split(key)
        space = jnp.asarray(
            [action_space_size(c) for c in self.group_channels], jnp.int32
        )[group_ids]
        rand = (jax.random.uniform(k1, (b,)) * space).astype(jnp.int32)
        explore = jax.random.uniform(k2, (b,)) < eps
        actions = jnp.where(explore, rand, greedy)
        return actions, q_sel


def _select_by_group(per_group_list, group_ids):
    """Pick each sample's own group output: list of (B, ...) -> (B, ...)."""
    stacked = jnp.stack(per_group_list, axis=0)  # (G, B, ...)
    return stacked[group_ids, jnp.arange(group_ids.shape[0])]
