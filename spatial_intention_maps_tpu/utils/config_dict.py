"""Attribute-access config dicts with YAML round-tripping.

Equivalent role to the reference's Munch-based YAML configs (utils.py:18-25),
implemented standalone (no third-party ``munch`` dependency).
"""

import yaml


class ConfigDict(dict):
    """A dict whose keys are also attributes, recursively."""

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name, value):
        self[name] = value

    def __delattr__(self, name):
        try:
            del self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    @classmethod
    def from_nested(cls, obj):
        if isinstance(obj, dict):
            return cls({k: cls.from_nested(v) for k, v in obj.items()})
        if isinstance(obj, (list, tuple)):
            return [cls.from_nested(v) for v in obj]
        return obj

    def to_nested(self):
        def conv(obj):
            if isinstance(obj, dict):
                return {k: conv(v) for k, v in obj.items()}
            if isinstance(obj, (list, tuple)):
                return [conv(v) for v in obj]
            return obj

        return conv(self)

    @classmethod
    def from_yaml(cls, stream):
        return cls.from_nested(yaml.safe_load(stream))

    def to_yaml(self):
        return yaml.safe_dump(self.to_nested(), default_flow_style=None, sort_keys=False)

    def copy(self):
        return ConfigDict.from_nested(self)
