"""Keyboard teleoperation for physical robots
(vector_keyboard_controller.py role parity), terminal-based (no GUI dep):
WASD to drive, space to stop, r/f lift up/down, q to quit."""

import sys
import termios
import tty


def _read_key():
    fd = sys.stdin.fileno()
    old = termios.tcgetattr(fd)
    try:
        tty.setraw(fd)
        return sys.stdin.read(1)
    finally:
        termios.tcsetattr(fd, termios.TCSADRAIN, old)


def teleop(robot_index, speed=0.06):  # pragma: no cover - hardware path
    from . import vector_sdk
    from .real_env import _VectorTransport

    transport = _VectorTransport(vector_sdk.connect(robot_index))
    print("WASD drive, space stop, r/f lift, q quit")
    while True:
        key = _read_key().lower()
        if key == "q":
            transport.set_wheel_speeds(0, 0)
            break
        if key == "w":
            transport.set_wheel_speeds(speed, speed)
        elif key == "s":
            transport.set_wheel_speeds(-speed, -speed)
        elif key == "a":
            transport.set_wheel_speeds(-speed / 2, speed / 2)
        elif key == "d":
            transport.set_wheel_speeds(speed / 2, -speed / 2)
        elif key == " ":
            transport.set_wheel_speeds(0, 0)
        elif key == "r":
            transport.set_lift(up=True)
        elif key == "f":
            transport.set_lift(up=False)


if __name__ == "__main__":  # pragma: no cover
    teleop(int(sys.argv[1]) if len(sys.argv) > 1 else 0)
