"""Metric logging: TensorBoard if available, JSONL always.

Replaces the reference's SummaryWriter pair (train.py:219-220) with a
TPU-friendly non-blocking logger.
"""

import json
import time
from pathlib import Path


class MetricLogger:
    def __init__(self, log_dir):
        self.log_dir = Path(log_dir)
        self.log_dir.mkdir(parents=True, exist_ok=True)
        self._jsonl = open(self.log_dir / "metrics.jsonl", "a")
        self._tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._tb = SummaryWriter(log_dir=str(self.log_dir / "train"))
        except Exception:
            pass

    def log(self, step, metrics: dict):
        rec = {"step": int(step), "time": time.time()}
        for k, v in metrics.items():
            try:
                rec[k] = float(v)
            except (TypeError, ValueError):
                continue
            if self._tb is not None:
                self._tb.add_scalar(k, rec[k], step)
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()

    def log_image(self, tag, image, step):
        """image: (H, W, 3) float [0, 1] (Q-map visualizations,
        train.py:292-304)."""
        if self._tb is not None:
            self._tb.add_image(tag, image.transpose(2, 0, 1), step)

    def close(self):
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
