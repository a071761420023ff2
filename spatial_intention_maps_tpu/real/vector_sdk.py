"""Anki Vector SDK glue (vector_utils.py / vector_keep_still.py /
vector_keyboard_controller.py role parity), import-gated: everything raises a
clear error when the SDK isn't installed."""

import configparser
from pathlib import Path


def _require_sdk():
    try:
        import anki_vector  # noqa: F401

        return anki_vector
    except Exception as e:  # pragma: no cover - hardware path
        raise RuntimeError(
            "the physical-robot path needs the anki_vector SDK (not bundled)"
        ) from e


def get_config():
    """Parsed ~/.anki_vector/sdk_config.ini (vector_utils.py)."""
    parser = configparser.ConfigParser()
    parser.read(Path.home() / ".anki_vector" / "sdk_config.ini")
    return {serial: dict(parser[serial]) for serial in parser.sections()}


def get_robot_serial(robot_index):
    cfg = get_config()
    for serial, fields in cfg.items():
        name = fields.get("name", "")
        if name.endswith(f"-{robot_index:02d}") or name.endswith(str(robot_index)):
            return serial
    raise KeyError(robot_index)


def connect(robot_index):  # pragma: no cover - hardware path
    anki_vector = _require_sdk()
    serial = get_robot_serial(robot_index)
    robot = anki_vector.Robot(serial=serial, default_logging=False)
    robot.connect()
    return robot


def keep_still(robot_index):  # pragma: no cover - hardware path
    """Connect and hold the robot still (vector_keep_still.py)."""
    robot = connect(robot_index)
    robot.motors.set_wheel_motors(0, 0)
    return robot
