"""Host-friendly inference policy with the reference's nested-list interface
(policies.py:47-74): ``step(state)`` takes [group][robot] observations (None
for robots not awaiting) and returns [group][robot] flat actions.

Used by evaluate.py / enjoy.py / the interactive tools.
"""

import jax
import jax.numpy as jnp
import numpy as np

from . import factory
from .policies import DQNPolicy, action_space_size
from .utils.checkpoint import _load_tree


class EvalPolicy:
    def __init__(self, cfg, variables=None, seed=0):
        self.cfg = cfg
        self.env_params = factory.env_params_from_cfg(cfg)
        self.policy = DQNPolicy(
            self.env_params,
            num_input_channels=cfg.num_input_channels,
            use_predicted_intention=cfg.get("use_predicted_intention", False),
            layer_planes=cfg.get("fcn_layer_planes"),
            head_planes=cfg.get("fcn_head_planes"),
        )
        self.key = jax.random.PRNGKey(seed)
        if variables is None:
            if cfg.get("policy_path"):
                tree = _load_tree(cfg.policy_path)
                variables = {"policy": tree["variables"]}
                if "intention_variables" in tree:
                    variables["intention"] = tree["intention_variables"]
                print("=> loaded policy '{}'".format(cfg.policy_path))
            else:
                self.key, k = jax.random.split(self.key)
                variables = self.policy.init(k)
        self.variables = variables
        self._act = jax.jit(
            lambda v, obs, g, eps, k: self.policy.act(v, obs, g, eps, k)
        )

    def step(self, state, exploration_eps=None, debug=False):
        if exploration_eps is None:
            exploration_eps = self.cfg.final_exploration
        action = [[None for _ in g] for g in state]
        q_info = [[None for _ in g] for g in state]
        for gi, group in enumerate(state):
            for j, s in enumerate(group):
                if s is None:
                    continue
                obs = jnp.asarray(s)[None]
                self.key, k = jax.random.split(self.key)
                acts, q = self._act(
                    self.variables, obs, jnp.array([gi], jnp.int32),
                    exploration_eps, k,
                )
                action[gi][j] = int(acts[0])
                q_info[gi][j] = np.asarray(q[0])
        if debug:
            return action, {"output": q_info}
        return action
