"""Interactive multi-agent GUI (tools_interactive_gui.py role parity,
matplotlib instead of PyQt5).

Layout: one clickable state image per robot (the robot awaiting action is
highlighted), a global overhead view, and optional Q-map overlays from a
loaded policy.  Left-click = move (channel 0); right-click = move + end
effector (channel 1).  Keys: 'p' = let the policy act, 'r' = reset,
'q' = quit.

Pose editor ('e' toggles; replaces the reference GUI's mouse-drag of
PyBullet bodies): in edit mode, drag a robot or cube on the overhead view to
teleport it; ',' / '.' rotate the selected robot by 15 degrees.  Edits go
through SimEnv.set_poses, which also moves the servo target and re-observes.
"""

import argparse

import numpy as np

from spatial_intention_maps_tpu import config as config_mod
from spatial_intention_maps_tpu import constants, factory
from spatial_intention_maps_tpu.envs import geometry
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
        self.edit_mode = False
        self._drag = None  # ("robot"|"cube", index) while dragging
        # Transition viewer bookkeeping (reference GUI's transition viewer):
        # last (state, action) per robot + the completing next state.
        self._pending = [None] * self.params.num_robots
        self._last_transition = [None] * self.params.num_robots
        self.fig.canvas.mpl_connect("button_press_event", self._on_click)
        self.fig.canvas.mpl_connect("key_press_event", self._on_key)
        self.fig.canvas.mpl_connect("motion_notify_event", self._on_motion)
        self.fig.canvas.mpl_connect("button_release_event", self._on_release)

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
        prev_flat = self._flat_state()
        act_flat = [a for g in action_nested for a in g]
        for rr in range(self.params.num_robots):
            if act_flat[rr] is not None and prev_flat[rr] is not None:
                self._pending[rr] = (prev_flat[rr], act_flat[rr])
        self.state, reward, done, info = self.env.step(action_nested)
        print("reward:", reward, "done:", done)
        new_flat = self._flat_state()
        for rr in range(self.params.num_robots):
            if self._pending[rr] is not None and (new_flat[rr] is not None or done):
                s, a = self._pending[rr]
                self._last_transition[rr] = (s, a, new_flat[rr])
                self._pending[rr] = None
        if done:
            self.state = self.env.reset()
        self._redraw()

    def _show_transitions(self):
        """Transition viewer: last completed (state, action, next state) per
        robot in a separate figure."""
        r_n = self.params.num_robots
        fig, axes = self.plt.subplots(2, r_n, figsize=(3 * r_n, 6.5), squeeze=False)
        for rr in range(r_n):
            tr = self._last_transition[rr]
            for row in range(2):
                ax = axes[row][rr]
                ax.axis("off")
            if tr is None:
                axes[0][rr].set_title(f"robot {rr}: no transition")
                continue
            s, a, s2 = tr
            ch, rest = divmod(a, N * N)
            i, j = divmod(rest, N)
            vis = get_state_visualization(s)
            axes[0][rr].imshow(np.clip(vis, 0, 1))
            axes[0][rr].plot([j], [i], "r+", markersize=10)
            axes[0][rr].set_title(f"robot {rr} act=(c{ch},{i},{j})", fontsize=8)
            if s2 is not None:
                axes[1][rr].imshow(np.clip(get_state_visualization(s2), 0, 1))
                axes[1][rr].set_title("next state", fontsize=8)
            else:
                axes[1][rr].set_title("episode ended", fontsize=8)
        fig.show()

    def _export_figures(self, out_dir="figures"):
        """Figure export (reference GUI's figure-export path): per-robot state
        channel images + overhead view as PNGs."""
        import os

        from spatial_intention_maps_tpu.utils.visualization import (
            render_global_overhead,
        )

        os.makedirs(out_dir, exist_ok=True)
        flat = self._flat_state()
        for rr, s in enumerate(flat):
            if s is None:
                continue
            for c in range(s.shape[-1]):
                self.plt.imsave(
                    f"{out_dir}/robot{rr}_channel{c}.png", s[:, :, c], cmap="gray"
                )
            self.plt.imsave(
                f"{out_dir}/robot{rr}_state.png",
                np.clip(get_state_visualization(s), 0, 1),
            )
        self.plt.imsave(
            f"{out_dir}/overhead.png",
            np.clip(render_global_overhead(self.params, self.env.state), 0, 1),
        )
        print(f"figures written to {out_dir}/")

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

    # -- pose editing ---------------------------------------------------
    def _overhead_world(self, event):
        """Pixel coords on the overhead axis -> world (x, y) meters."""
        h, w = self.params.map_shape
        return geometry.pixel_to_position(
            int(round(event.ydata)), int(round(event.xdata)), h, w
        )

    def _pick_body(self, x, y):
        st = self.env.state
        rp = np.asarray(st.robot_pos)
        d = np.hypot(rp[:, 0] - x, rp[:, 1] - y)
        r = int(np.argmin(d))
        if d[r] < 0.06:
            return ("robot", r)
        cp = np.asarray(st.cube_pos)[:, :2]
        alive = np.asarray(st.cube_status) == 0  # CUBE_AVAILABLE
        dc = np.where(alive, np.hypot(cp[:, 0] - x, cp[:, 1] - y), np.inf)
        c = int(np.argmin(dc))
        if dc[c] < 0.05:
            return ("cube", c)
        return None

    def _apply_drag(self, x, y):
        kind, idx = self._drag
        st = self.env.state
        if kind == "robot":
            rp = np.asarray(st.robot_pos).copy()
            rp[idx] = (x, y)
            self.state = self.env.set_poses(robot_pos=rp)
        else:
            cp = np.asarray(st.cube_pos).copy()
            cp[idx, 0], cp[idx, 1] = x, y
            self.state = self.env.set_poses(cube_pos=cp)
        self._redraw()

    def _on_motion(self, event):
        if self._drag is None or event.inaxes is not self.axes[-1]:
            return
        self._apply_drag(*self._overhead_world(event))

    def _on_release(self, event):
        self._drag = None

    # -- events --------------------------------------------------------
    def _on_click(self, event):
        if event.inaxes is None:
            return
        if self.edit_mode and event.inaxes is self.axes[-1]:
            x, y = self._overhead_world(event)
            self._drag = self._pick_body(x, y)
            if self._drag:
                print(f"editing {self._drag[0]} {self._drag[1]}")
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
        elif event.key == "t":
            self._show_transitions()
        elif event.key == "s":
            self._export_figures()
        elif event.key == "e":
            self.edit_mode = not self.edit_mode
            self._drag = None
            print(f"pose edit mode: {'ON' if self.edit_mode else 'off'}")
            self._redraw()
        elif event.key in (",", ".") and self._drag and self._drag[0] == "robot":
            idx = self._drag[1]
            rh = np.asarray(self.env.state.robot_heading).copy()
            rh[idx] += np.radians(15 if event.key == "." else -15)
            self.state = self.env.set_poses(robot_heading=rh)
            self._redraw()

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
        ax.set_title("overhead [EDIT]" if self.edit_mode else "overhead")
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
