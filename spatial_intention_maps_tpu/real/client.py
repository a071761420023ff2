"""Pose-server test client (aruco/simple_client.py parity)."""

import time
from multiprocessing.connection import Client

from . import POSE_SERVER_AUTHKEY


def main(port=6000, n=10):
    conn = Client(("localhost", port), authkey=POSE_SERVER_AUTHKEY)
    for _ in range(n):
        t0 = time.time()
        conn.send(None)
        robot_poses, cube_poses = conn.recv()
        print(f"{1000 * (time.time() - t0):.1f} ms", robot_poses, cube_poses)


if __name__ == "__main__":
    main()
