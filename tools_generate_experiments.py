"""Generate the full experiment-config tree from one template
(tools_generate_experiments.py parity: base 27, ours 16, intention-map
variants 18, intention channels 12, history 6, predicted intention 12,
local 1 — same derivation rules, same discount-factor table)."""

from pathlib import Path

from spatial_intention_maps_tpu import config as config_mod
from spatial_intention_maps_tpu.utils.config_dict import ConfigDict


def template_config():
    """The lifting_1-small_empty template (config/templates/
    lifting_1-small_empty.yml keys + TPU-runtime keys)."""
    cfg = config_mod.default_config()
    cfg.experiment_name = "lifting_1-small_empty"
    cfg.total_timesteps = None
    cfg.discount_factors = None
    return cfg


# Per-group discount by robot type and team size (the experiment spec from
# reference tools_generate_experiments.py:22-47): manipulation types use
# 0.75 solo / 0.85 in teams; rescue episodes are short, so 0.2 / 0.35.
DISCOUNTS = {
    "lifting_robot":  {"solo": 0.75, "team": 0.85},
    "pushing_robot":  {"solo": 0.75, "team": 0.85},
    "throwing_robot": {"solo": 0.75, "team": 0.85},
    "rescue_robot":   {"solo": 0.20, "team": 0.35},
}


def get_discount_factors(robot_config):
    """One discount per robot group, keyed on type + whole-team size."""
    team = sum(n for g in robot_config for n in g.values()) > 1
    return [
        DISCOUNTS[robot_type]["team" if team else "solo"]
        for g in robot_config
        for robot_type in g
    ]


def generate_experiment(experiment_name, template_cfg, modify_cfg_fn, output_dir):
    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    cfg = ConfigDict.from_nested(template_cfg)
    cfg.experiment_name = experiment_name
    num_fields = len(cfg)
    modify_cfg_fn(cfg)
    assert num_fields == len(cfg), experiment_name  # no new fields
    config_mod.save_config(output_dir / "{}.yml".format(experiment_name), cfg)
    return cfg


TOTAL_TIMESTEPS = {"lifting": 40000, "pushing": 60000, "rescue": 3750, "throwing": 40000}


def main(root="configs"):
    root = Path(root)
    base_dir = root / "experiments" / "base"
    generated = {}

    def gen(name, template_name, fn, output_dir):
        template = generated.get(template_name) or template_config()
        cfg = generate_experiment(name, template, fn, output_dir)
        generated[name] = cfg
        return cfg

    # ---- Robot types (base single-agent) ----
    def mk_single(robot_type):
        def fn(cfg):
            cfg.robot_config = [{robot_type: 1}]
            cfg.discount_factors = get_discount_factors(cfg.robot_config)
            cfg.total_timesteps = TOTAL_TIMESTEPS[robot_type.split("_")[0]]
            if robot_type == "rescue_robot":
                cfg.num_input_channels -= 1
                config_mod.apply_misc_env_modifications(cfg, "rescue_1")
        return fn

    gen("lifting_1-small_empty-base", None, mk_single("lifting_robot"), base_dir)
    gen("pushing_1-small_empty-base", None, mk_single("pushing_robot"), base_dir)
    gen("rescue_1-small_empty-base", None, mk_single("rescue_robot"), base_dir)

    # ---- Multi-agent ----
    def mk_multi(robot_config):
        def fn(cfg):
            cfg.robot_config = robot_config
            num_robots = sum(next(iter(g.values())) for g in robot_config)
            cfg.total_timesteps *= num_robots
            cfg.train_freq = num_robots
            cfg.discount_factors = get_discount_factors(robot_config)
        return fn

    gen("lifting_4-small_empty-base", "lifting_1-small_empty-base",
        mk_multi([{"lifting_robot": 4}]), base_dir)
    gen("pushing_4-small_empty-base", "pushing_1-small_empty-base",
        mk_multi([{"pushing_robot": 4}]), base_dir)
    gen("rescue_4-small_empty-base", "rescue_1-small_empty-base",
        mk_multi([{"rescue_robot": 4}]), base_dir)
    gen("lifting_2_throwing_2-small_empty-base", "lifting_1-small_empty-base",
        mk_multi([{"lifting_robot": 2}, {"throwing_robot": 2}]), base_dir)
    gen("lifting_2_pushing_2-small_empty-base", "pushing_1-small_empty-base",
        mk_multi([{"lifting_robot": 2}, {"pushing_robot": 2}]), base_dir)

    # ---- Local development config ----
    def mk_local(cfg):
        cfg.logs_dir = "logs"
        cfg.checkpoints_dir = "checkpoints"
        cfg.batch_size = 4
        cfg.replay_buffer_size = 1000
        cfg.learning_starts_frac = 0.0000625
        cfg.inactivity_cutoff_per_robot = 5
        cfg.show_gui = True
        cfg.use_egl_renderer = False

    gen("lifting_4-small_empty-local", "lifting_4-small_empty-base", mk_local,
        root / "local")

    # ---- Environments ----
    def mk_env(env_name):
        def fn(cfg):
            cfg.env_name = env_name
            config_mod.apply_misc_env_modifications(cfg, env_name)
        return fn

    for tmpl in ["lifting_1-small_empty-base", "lifting_4-small_empty-base"]:
        for env_name in ["small_divider", "large_empty", "large_doors",
                         "large_tunnels", "large_rooms"]:
            gen(tmpl.replace("small_empty", env_name), tmpl, mk_env(env_name), base_dir)
    for tmpl in ["pushing_1-small_empty-base", "pushing_4-small_empty-base"]:
        for env_name in ["small_divider", "large_empty"]:
            gen(tmpl.replace("small_empty", env_name), tmpl, mk_env(env_name), base_dir)
    tmpl = "lifting_2_pushing_2-small_empty-base"
    for env_name in ["large_empty", "large_doors", "large_rooms"]:
        gen(tmpl.replace("small_empty", env_name), tmpl, mk_env(env_name), base_dir)
    tmpl = "lifting_2_throwing_2-small_empty-base"
    for env_name in ["large_empty", "large_doors"]:
        gen(tmpl.replace("small_empty", env_name), tmpl, mk_env(env_name), base_dir)
    for tmpl in ["rescue_1-small_empty-base", "rescue_4-small_empty-base"]:
        gen(tmpl.replace("small_empty", "large_empty"), tmpl, mk_env("large_empty"), base_dir)

    # ---- Ours: intention map (ramp) ----
    def mk_intention_map(encoding):
        def fn(cfg):
            cfg.use_intention_map = True
            cfg.intention_map_encoding = encoding
            cfg.num_input_channels += 1
        return fn

    for path in sorted(base_dir.glob("*.yml")):
        name = path.stem
        if name.startswith(("lifting_1", "pushing_1", "rescue_1", "throwing_1")):
            continue
        if name.startswith(("lifting_2_pushing_2-small_empty",
                            "lifting_2_throwing_2-small_empty")):
            continue
        gen(name.replace("base", "ours"), name, mk_intention_map("ramp"),
            root / "experiments" / "ours")

    # ---- Comparisons / ablations ----
    comparison_templates = [
        "lifting_4-large_doors-base", "lifting_4-large_empty-base",
        "lifting_4-large_rooms-base", "lifting_4-large_tunnels-base",
        "lifting_4-small_divider-base", "lifting_4-small_empty-base",
    ]

    def mk_intention_channels(encoding):
        def fn(cfg):
            cfg.use_intention_channels = True
            cfg.intention_channel_encoding = encoding
            num_robots = sum(sum(g.values()) for g in cfg.robot_config)
            cfg.num_input_channels += (
                2 if encoding == "nonspatial" else 1
            ) * (num_robots - 1)
        return fn

    def mk_history(cfg):
        cfg.use_history_map = True
        cfg.num_input_channels += 1

    def mk_predicted(cfg):
        cfg.use_predicted_intention = True
        cfg.num_input_channels += 1

    def mk_predicted_with_history(cfg):
        mk_history(cfg)
        mk_predicted(cfg)

    for tmpl in comparison_templates:
        for variant in ["binary", "line", "circle"]:
            gen(tmpl.replace("base", variant), tmpl, mk_intention_map(variant),
                root / "experiments" / "comparisons" / "intention_maps")
        for encoding in ["spatial", "nonspatial"]:
            gen(tmpl.replace("base", encoding), tmpl, mk_intention_channels(encoding),
                root / "experiments" / "comparisons" / "intention_channels")
        gen(tmpl.replace("base", "history"), tmpl, mk_history,
            root / "experiments" / "comparisons" / "history_maps")
        gen(tmpl.replace("base", "predicted"), tmpl, mk_predicted,
            root / "experiments" / "comparisons" / "predicted_intention")
        gen(tmpl.replace("base", "predicted_with_history"), tmpl,
            mk_predicted_with_history,
            root / "experiments" / "comparisons" / "predicted_intention")

    n = len(list(Path(root).rglob("*.yml")))
    print(f"generated {n} configs under {root}/")


if __name__ == "__main__":
    main()
