"""Train a spatial-intention-maps DQN on TPU.

Equivalent of the reference's train.py / train_multiprocess.py combined: the
multiprocess actor pool is a batch axis on device, and the learner runs in
the same program.

Usage:
    python train.py --config-path configs/experiments/base/lifting_1-small_empty-base.yml
"""

import argparse
import sys
from pathlib import Path

import numpy as np

from spatial_intention_maps_tpu import config as config_mod
from spatial_intention_maps_tpu import factory
from spatial_intention_maps_tpu.train.fused import FusedTrainer as Trainer
from spatial_intention_maps_tpu.utils.checkpoint import save_checkpoint
from spatial_intention_maps_tpu.utils.logging_utils import MetricLogger


def main(cfg, num_devices=None):
    log_dir = Path(cfg.log_dir)
    checkpoint_dir = Path(cfg.checkpoint_dir)
    print("log_dir: {}".format(log_dir))
    print("checkpoint_dir: {}".format(checkpoint_dir))

    overrides = {}
    if cfg.get("use_predicted_intention"):
        # Ground-truth intention channel during training (train.py:177-180).
        overrides["use_intention_map"] = True
        overrides["intention_map_encoding"] = "ramp"
    env_params = factory.env_params_from_cfg(cfg, **overrides)

    trainer = Trainer(
        cfg, env_params,
        num_envs=cfg.get("num_parallel_envs", 32),
        seed=cfg.get("random_seed") or 0,
        num_devices=num_devices,
    )
    if trainer.mesh is not None:
        print(f"mesh: {trainer.num_devices} devices (dp), "
              f"{trainer.num_envs // trainer.num_devices} envs/device")

    # Resume (train.py:200-210 parity): policy weights + optimizer/replay.
    if cfg.get("policy_path"):
        from spatial_intention_maps_tpu.utils.checkpoint import load_policy

        load_policy(cfg.policy_path, trainer)
        print("=> loaded policy '{}'".format(cfg.policy_path))
    if cfg.get("checkpoint_path"):
        from spatial_intention_maps_tpu.utils.checkpoint import load_checkpoint

        load_checkpoint(cfg.checkpoint_path, trainer)
        print(
            "=> loaded checkpoint '{}' (timestep {})".format(
                cfg.checkpoint_path, trainer.timestep
            )
        )

    logger = MetricLogger(log_dir)

    ckpt_every = cfg.checkpoint_freq
    next_ckpt = ckpt_every
    next_vis = ckpt_every

    def log_qmap_visualization(timestep):
        """Q-map image logging (train.py:292-304 parity): run a random replay
        state through the policy in debug mode and render state|Q panels."""
        from spatial_intention_maps_tpu.utils.visualization import (
            get_state_output_visualization,
        )
        import jax
        import jax.numpy as jnp

        for g in range(trainer.policy.num_groups):
            buf = trainer.buffers[g]
            if int(buf.size) < 1:
                continue
            k = jax.random.PRNGKey(timestep + g)
            batch = buf.sample(k, 1)
            state_img = np.asarray(batch["state"][0], np.float32)
            q = trainer.policy.models[g].apply(
                trainer.train_states[g].variables, batch["state"], train=False
            )
            q_chw = np.asarray(jnp.transpose(q[0], (2, 0, 1)))
            vis = get_state_output_visualization(state_img, q_chw)
            logger.log_image(f"output/robot_group_{g + 1:02d}", vis, timestep)

    def log_fn(timestep, metrics, info, done):
        nonlocal next_ckpt, next_vis
        logger.log(timestep, metrics)
        if timestep >= next_vis:
            try:
                log_qmap_visualization(timestep)
            except Exception as e:  # visualization must never kill training
                print("qmap visualization failed:", e)
            next_vis += ckpt_every
        if timestep >= next_ckpt:
            # Replay buffers are a ~GB device->host transfer; on a
            # remote-attached TPU (10 MB/s tunnel) a single buffer pull
            # stalls training for many minutes, so buffer checkpoints are
            # strictly opt-in (cfg.checkpoint_include_buffers).  Resume
            # without buffers matches the reference's policy-only resume.
            save_checkpoint(
                checkpoint_dir, timestep, trainer,
                include_buffers=bool(cfg.get("checkpoint_include_buffers", False)),
            )
            cfg.policy_path = str(checkpoint_dir / f"policy_{timestep:08d}")
            cfg.checkpoint_path = str(checkpoint_dir / f"checkpoint_{timestep:08d}")
            config_mod.save_config(log_dir / "config.yml", cfg)
            next_ckpt += ckpt_every

    trainer.run(log_fn=log_fn)
    # Buffers stay opt-in here too: the end-of-run ring pull is a multi-GB
    # device->host transfer (many minutes through a remote-TPU tunnel).
    save_checkpoint(
        checkpoint_dir, trainer.timestep, trainer,
        include_buffers=bool(cfg.get("checkpoint_include_buffers", False)),
    )
    logger.close()


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--config-path")
    parser.add_argument(
        "--num-devices", type=int, default=None,
        help="shard the env batch over an N-device dp mesh "
             "(default: cfg.mesh_shape or 1)",
    )
    parser.add_argument(
        "--trace-dir", default=None,
        help="capture a jax.profiler device trace of rounds 16-24",
    )
    parser.add_argument(
        "--checkpoint-freq", type=int, default=None,
        help="override cfg.checkpoint_freq (ops cadence only — each save is "
             "a multi-10s device->host pull on remote-attached TPUs)",
    )
    parser.add_argument(
        "--num-envs", type=int, default=None,
        help="override cfg.num_parallel_envs (env batch size)",
    )
    args = parser.parse_args()
    config_path = args.config_path
    if config_path is None:
        config_path = config_mod.select_run()
    if config_path is None:
        print("no config found; pass --config-path")
        sys.exit(1)
    config_path = config_mod.setup_run(config_path)
    cfg = config_mod.load_config(config_path)
    if args.trace_dir:
        cfg.profile_trace_dir = args.trace_dir
    if args.checkpoint_freq is not None:
        cfg.checkpoint_freq = args.checkpoint_freq
    if args.num_envs is not None:
        cfg.num_parallel_envs = args.num_envs
    main(cfg, num_devices=args.num_devices)
