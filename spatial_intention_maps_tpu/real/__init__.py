"""Host-side real-robot stack (optional; SURVEY §2 'aruco/real bridge').

Pure Python/OpenCV — deliberately off the TPU path.  Protocol-compatible
with the reference: pose servers listen on localhost ports 6000 (small
board) / 6001+6002 (large board left/right cameras) with authkey
b'secret password' and answer (robot_poses, cube_poses) dicts per request
(aruco/server.py:209-258, envs.py:179-185).
"""

POSE_SERVER_PORTS = {"small": (6000,), "large": (6001, 6002)}
POSE_SERVER_AUTHKEY = b"secret password"

# Marker id registry (aruco/utils.py:8-16): robots 0-9, cubes 10-33.
ROBOT_MARKER_IDS = list(range(0, 10))
CUBE_MARKER_IDS = list(range(10, 34))
