"""Visualization helpers (utils.py:95-156 parity) + a matplotlib env viewer
replacing the PyBullet GUI for enjoy/tools."""

import numpy as np

from .. import constants
from ..envs import mapper as mapper_mod


def jet_colormap():
    try:
        from matplotlib import cm

        return np.array([list(cm.jet(i)[:3]) for i in range(256)], dtype=np.float32)
    except Exception:
        # Piecewise-linear jet approximation.
        t = np.linspace(0, 1, 256)
        r = np.clip(1.5 - np.abs(4 * t - 3), 0, 1)
        g = np.clip(1.5 - np.abs(4 * t - 2), 0, 1)
        b = np.clip(1.5 - np.abs(4 * t - 1), 0, 1)
        return np.stack([r, g, b], axis=1).astype(np.float32)


JET = jet_colormap()


def to_uint8_image(image):
    return np.round(255.0 * np.clip(image, 0, 1)).astype(np.uint8)


def scale_min_max(image):
    return (image - image.min()) / (image.max() - image.min() + 1e-6)


def get_state_visualization(state):
    """utils.py:104-109: RGB composite of selected state channels."""
    if state.shape[2] == 1:
        return np.stack([state[:, :, 0]] * 3, axis=2)
    if state.shape[2] == 2:
        return np.stack((state[:, :, 1], state[:, :, 0], state[:, :, 0]), axis=2)
    return np.stack((state[:, :, 1], state[:, :, 0], state[:, :, -1]), axis=2)


def get_overhead_image(state):
    return np.stack([state[:, :, 0]] * 3, axis=2)


def get_output_visualization(overhead_image, output, alpha=0.5):
    return (1 - alpha) * overhead_image + alpha * JET[output, :]


def get_state_output_visualization(state, output):
    """State | Q-map panels with JET overlay (utils.py:118-131), used for
    TensorBoard images (train.py:292-304)."""
    panels = []
    vertical_bar = np.zeros((state.shape[0], 1, 3), dtype=np.float32)
    panels.append(get_state_visualization(state))
    panels.append(vertical_bar)
    overhead_image = get_overhead_image(state)
    output = to_uint8_image(scale_min_max(output))
    for i in range(output.shape[0]):
        panels.append(get_output_visualization(overhead_image, output[i]))
        if i < output.shape[0] - 1:
            panels.append(vertical_bar)
    return np.concatenate(panels, axis=1)


def render_global_overhead(params, state):
    """Analytic top-down RGB render of the current true scene — the GUI /
    video substitute for p.getCameraImage."""
    import jax.numpy as jnp

    seg = np.asarray(mapper_mod.current_seg_map(params, state))
    overlay, _ = mapper_mod.robot_seg_overlay(params, state)
    overlay = np.asarray(overlay)
    seg = np.where(overlay > 0, overlay, seg)

    palette = np.zeros((9, 3), np.float32)
    palette[constants.SEG_FLOOR] = (1.0, 1.0, 1.0)
    palette[constants.SEG_OBSTACLE] = (0.9, 0.9, 0.9)
    palette[constants.SEG_RECEPTACLE] = (1.0, 0.34, 0.35)
    palette[constants.SEG_CUBE] = (0.93, 0.79, 0.28)
    for g in range(4):
        shade = 0.35 + 0.1 * g
        palette[constants.SEG_ROBOT_GROUP_1 + g] = (shade, shade, shade)
    return palette[seg]


class EnvViewer:
    """Live matplotlib window over a SimEnv."""

    def __init__(self, env):
        import matplotlib

        matplotlib.use(matplotlib.get_backend())
        import matplotlib.pyplot as plt

        self.env = env
        self.plt = plt
        self.plt.ion()
        self.fig, self.ax = plt.subplots(figsize=(8, 4))
        self.im = None

    def update(self):
        rgb = render_global_overhead(self.env.params, self.env.state)
        if self.im is None:
            self.im = self.ax.imshow(rgb)
            self.ax.axis("off")
        else:
            self.im.set_data(rgb)
        self.plt.pause(0.001)
