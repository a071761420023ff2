"""Single-agent click-to-act GUI (tools_simple_gui.py parity).

Shows the robot's state image; left-click = move to pixel (channel 0),
right-click = move + end-effector action (channel 1); action index =
c*96*96 + y*96 + x (tools_simple_gui.py:40, 57-63).  Uses OpenCV when
available, else matplotlib.
"""

import argparse

import numpy as np

from spatial_intention_maps_tpu import config as config_mod
from spatial_intention_maps_tpu import constants, factory
from spatial_intention_maps_tpu.utils.visualization import get_state_visualization

N = constants.LOCAL_MAP_PIXEL_WIDTH


class SimpleGui:
    def __init__(self, cfg, scale=4):
        self.env = factory.get_env_from_cfg(cfg)
        self.scale = scale
        self.clicked_action = None
        assert self.env.params.num_robots == 1, "simple GUI is single-agent"

    def _on_mouse(self, event, x, y, flags, param):
        import cv2

        if event == cv2.EVENT_LBUTTONDOWN:
            channel = 0
        elif event == cv2.EVENT_RBUTTONDOWN:
            channel = 1
        else:
            return
        i, j = y // self.scale, x // self.scale
        channel = min(channel, self.env.params.max_output_channels - 1)
        self.clicked_action = channel * N * N + i * N + j

    def run(self):
        import cv2

        window = "spatial_intention_maps_tpu"
        cv2.namedWindow(window)
        cv2.setMouseCallback(window, self._on_mouse)
        state = self.env.reset()
        while True:
            obs = state[0][0]
            vis = get_state_visualization(obs)
            vis = cv2.resize(
                (vis[:, :, ::-1] * 255).astype(np.uint8),
                (N * self.scale, N * self.scale),
                interpolation=cv2.INTER_NEAREST,
            )
            cv2.imshow(window, vis)
            key = cv2.waitKey(30)
            if key in (27, ord("q")):
                break
            if self.clicked_action is not None:
                action = [[self.clicked_action]]
                self.clicked_action = None
                state, reward, done, _ = self.env.step(action)
                print("reward:", reward[0][0])
                if done:
                    state = self.env.reset()
        cv2.destroyAllWindows()


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--config-path")
    args = parser.parse_args()
    config_path = args.config_path or config_mod.select_run()
    SimpleGui(config_mod.load_config(config_path)).run()
