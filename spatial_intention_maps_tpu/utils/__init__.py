from .config_dict import ConfigDict  # noqa: F401
