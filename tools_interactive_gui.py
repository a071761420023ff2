"""Interactive multi-agent GUI (tools_interactive_gui.py role parity,
matplotlib instead of PyQt5).

Layout: one clickable state image per robot (the robot awaiting action is
highlighted), a global overhead view, and optional Q-map overlays from a
loaded policy.  Left-click = move (channel 0); right-click = move + end
effector (channel 1).  Keys: 'p' = let the policy act, 'r' = reset,
'q' = quit.
"""

import argparse

import numpy as np

from spatial_intention_maps_tpu import config as config_mod
from spatial_intention_maps_tpu import constants, factory
from spatial_intention_maps_tpu.eval_policy import EvalPolicy
from spatial_intention_maps_tpu.utils.visualization import (
    get_state_visualization,
    render_global_overhead,
    scale_min_max,
    JET,
)

N = constants.LOCAL_MAP_PIXEL_WIDTH


class InteractiveGui:
    def __init__(self, cfg, use_policy=True):
        import matplotlib.pyplot as plt

        self.plt = plt
        self.env = factory.get_env_from_cfg(cfg)
        self.policy = EvalPolicy(cfg) if use_policy else None
        self.params = self.env.params
        r = self.params.num_robots
        self.fig, axes = plt.subplots(1, r + 1, figsize=(4 * (r + 1), 4.5))
        self.axes = np.atleast_1d(axes)
        self.images = [None] * (r + 1)
        self.state = None
        self.fig.canvas.mpl_connect("button_press_event", self._on_click)
        self.fig.canvas.mpl_connect("key_press_event", self._on_key)

    # -- helpers -------------------------------------------------------
    def _robot_of_axis(self, ax):
        for k, a in enumerate(self.axes[:-1]):
            if a is ax:
                return k
        return None

    def _flat_state(self):
        """[group][j] nested -> per-robot list."""
        flat = []
        for gi, group in enumerate(self.state):
            flat.extend(group)
        return flat

    def _step(self, action_nested):
        self.state, reward, done, info = self.env.step(action_nested)
        print("reward:", reward, "done:", done)
        if done:
            self.state = self.env.reset()
        self._redraw()

    def _action_nested_for(self, robot_index, flat_action):
        nested = []
        k = 0
        for gi in range(self.params.num_groups):
            row = []
            for rr in range(self.params.num_robots):
                if self.params.robot_groups[rr] == gi:
                    row.append(flat_action if rr == robot_index else None)
            nested.append(row)
        return nested

    # -- events --------------------------------------------------------
    def _on_click(self, event):
        if event.inaxes is None:
            return
        r = self._robot_of_axis(event.inaxes)
        if r is None:
            return
        flat = self._flat_state()
        if flat[r] is None:
            print(f"robot {r} is not awaiting an action")
            return
        i, j = int(event.ydata), int(event.xdata)
        channel = 0 if event.button == 1 else 1
        channel = min(channel, self.params.max_output_channels - 1)
        self._step(self._action_nested_for(r, channel * N * N + i * N + j))

    def _on_key(self, event):
        if event.key == "q":
            self.plt.close(self.fig)
        elif event.key == "r":
            self.state = self.env.reset()
            self._redraw()
        elif event.key == "p" and self.policy is not None:
            self._step(self.policy.step(self.state))

    # -- drawing -------------------------------------------------------
    def _redraw(self):
        flat = self._flat_state()
        q_info = None
        if self.policy is not None:
            _, info = self.policy.step(self.state, exploration_eps=0.0, debug=True)
            q_info = [q for group in info["output"] for q in group]
        for r in range(self.params.num_robots):
            ax = self.axes[r]
            ax.clear()
            awaiting = flat[r] is not None
            if awaiting:
                vis = get_state_visualization(flat[r])
                if q_info is not None and q_info[r] is not None:
                    q = scale_min_max(q_info[r][:, :, 0])
                    vis = 0.5 * vis + 0.5 * JET[(q * 255).astype(np.uint8)]
            else:
                vis = np.zeros((N, N, 3), np.float32)
            ax.imshow(np.clip(vis, 0, 1))
            ax.set_title(f"robot {r}" + (" [awaiting]" if awaiting else ""),
                         color="red" if awaiting else "black")
            ax.axis("off")
        ax = self.axes[-1]
        ax.clear()
        ax.imshow(render_global_overhead(self.params, self.env.state))
        ax.set_title("overhead")
        ax.axis("off")
        self.fig.canvas.draw_idle()

    def run(self):
        self.state = self.env.reset()
        self._redraw()
        self.plt.show()


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--config-path")
    parser.add_argument("--no-policy", action="store_true")
    args = parser.parse_args()
    config_path = args.config_path or config_mod.select_run()
    InteractiveGui(
        config_mod.load_config(config_path), use_policy=not args.no_policy
    ).run()
