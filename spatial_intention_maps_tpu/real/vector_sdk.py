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


def get_robot_names():
    return [f.get("name", "") for f in get_config().values()]


def write_config(cfg):
    """Write ~/.anki_vector/sdk_config.ini back (vector_utils.py parity)."""
    parser = configparser.ConfigParser()
    for serial, fields in cfg.items():
        parser[serial] = fields
    path = Path.home() / ".anki_vector" / "sdk_config.ini"
    with open(path, "w") as f:
        parser.write(f)
    return path


def run_mdns():  # pragma: no cover - hardware path
    """Discover every configured Vector over mDNS, print hostname/IP/MAC, and
    refresh the stored IPs (vector_run_mdns.py parity)."""
    import subprocess
    from multiprocessing.dummy import Pool

    anki_vector = _require_sdk()
    cfg = get_config()
    names = [f.get("name", "") for f in cfg.values()]
    with Pool(max(len(names), 1)) as pool:
        found = pool.map(anki_vector.mdns.VectorMdns.find_vector, names)
    for (serial, fields), result in zip(cfg.items(), found):
        name = fields.get("name", "")
        if result is None:
            print(f"{name} was not found")
            continue
        ip = result["ipv4"]
        subprocess.run(["ping", "-c", "1", ip],
                       stdout=subprocess.DEVNULL, check=False)
        arp = subprocess.run(["arp", "-an"], stdout=subprocess.PIPE,
                             check=False).stdout.decode(errors="replace")
        mac = arp[arp.find(ip):].split(" ")[2] if ip in arp else "?"
        print(f"Hostname:    {result['name'].lower().rstrip('.')}")
        print(f"IP address:  {ip}")
        print(f"MAC address: {mac}")
        cfg[serial]["ip"] = ip
    write_config(cfg)


if __name__ == "__main__":  # pragma: no cover
    run_mdns()
