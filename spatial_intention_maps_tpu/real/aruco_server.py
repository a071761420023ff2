"""ArUco pose-estimation server (aruco/server.py role parity).

Serves (robot_poses, cube_poses) dicts over authenticated
multiprocessing.connection sockets.  Per frame: warp the camera image into a
metric board frame via a one-time board-corner homography, detect robot
(ids 0-9) and cube (ids 10-33) markers, estimate headings from marker-corner
angle consensus with wraparound handling, reject cube side-faces by angle
spread.  Dual-camera (left/right) support for large boards.

Requires cv2 with the aruco contrib module and a camera; import is gated so
the simulation stack never depends on it.
"""

import math
import threading
import time
from multiprocessing.connection import Listener
from queue import Queue

import numpy as np

from . import CUBE_MARKER_IDS, POSE_SERVER_AUTHKEY, ROBOT_MARKER_IDS

PIXELS_PER_MM = 2.0


def _require_cv2():
    try:
        import cv2  # noqa: F401
        import cv2.aruco  # noqa: F401

        return cv2
    except Exception as e:  # pragma: no cover - hardware path
        raise RuntimeError(
            "the real-robot bridge needs opencv-contrib (cv2.aruco)"
        ) from e


class LatestFrameCamera:
    """Threaded capture keeping only the freshest frame (staleness flush,
    aruco/server.py:11-40)."""

    def __init__(self, camera_index=0, width=1280, height=720):
        cv2 = _require_cv2()
        self.cap = cv2.VideoCapture(camera_index)
        self.cap.set(cv2.CAP_PROP_FRAME_WIDTH, width)
        self.cap.set(cv2.CAP_PROP_FRAME_HEIGHT, height)
        self.queue = Queue(maxsize=1)
        self._stop = False
        self.thread = threading.Thread(target=self._loop, daemon=True)
        self.thread.start()

    def _loop(self):
        while not self._stop:
            ok, frame = self.cap.read()
            if not ok:
                time.sleep(0.01)
                continue
            if self.queue.full():
                try:
                    self.queue.get_nowait()
                except Exception:
                    pass
            self.queue.put(frame)

    def read(self):
        return self.queue.get()

    def close(self):
        self._stop = True
        self.cap.release()


class Board:
    """Metric board frame: one-time corner detection -> homography to a
    PIXELS_PER_MM warped view (aruco/server.py:84-116)."""

    def __init__(self, corner_ids, board_length_mm, board_width_mm, camera_params=None):
        self.cv2 = _require_cv2()
        self.corner_ids = corner_ids
        self.length_mm = board_length_mm
        self.width_mm = board_width_mm
        self.homography = None
        self.dictionary = self.cv2.aruco.getPredefinedDictionary(
            self.cv2.aruco.DICT_4X4_50
        )
        self.detector = self.cv2.aruco.ArucoDetector(self.dictionary)

    def calibrate(self, image):
        corners, ids, _ = self.detector.detectMarkers(image)
        if ids is None:
            return False
        found = {}
        for c, mid in zip(corners, ids.flatten()):
            if int(mid) in self.corner_ids:
                found[int(mid)] = c[0].mean(axis=0)
        if len(found) < 4:
            return False
        src = np.array([found[i] for i in self.corner_ids], np.float32)
        w = self.length_mm * PIXELS_PER_MM
        h = self.width_mm * PIXELS_PER_MM
        dst = np.array([[0, 0], [w, 0], [w, h], [0, h]], np.float32)
        self.homography = self.cv2.getPerspectiveTransform(src, dst)
        return True

    def warp(self, image):
        w = int(self.length_mm * PIXELS_PER_MM)
        h = int(self.width_mm * PIXELS_PER_MM)
        return self.cv2.warpPerspective(image, self.homography, (w, h))

    def pixel_to_position(self, px, py):
        """Warped pixel -> board-centered meters (y up)."""
        x = (px / PIXELS_PER_MM - self.length_mm / 2) / 1000.0
        y = (self.width_mm / 2 - py / PIXELS_PER_MM) / 1000.0
        return x, y

    def position_to_pixel(self, x, y):
        """Board-centered meters -> warped pixel (int) — the inverse of
        :meth:`pixel_to_position`, used by the debug overlay."""
        px = (x * 1000.0 + self.length_mm / 2) * PIXELS_PER_MM
        py = (self.width_mm / 2 - y * 1000.0) * PIXELS_PER_MM
        return int(round(px)), int(round(py))

    def detect_poses(self, warped):
        """-> (robot_poses, cube_poses): {marker_id: {'position': (x, y),
        'heading': rad}} with corner-angle-consensus headings and side-face
        rejection (aruco/server.py:111-186)."""
        corners, ids, _ = self.detector.detectMarkers(warped)
        robot_poses, cube_poses = {}, {}
        if ids is None:
            return robot_poses, cube_poses
        for c, mid in zip(corners, ids.flatten()):
            mid = int(mid)
            pts = c[0]  # 4 corners, clockwise from top-left
            center = pts.mean(axis=0)
            # Heading from the average of the four corner-edge angles, with
            # wraparound handling via the circular mean.
            edge_angles = []
            expected_offsets = [0.0, -math.pi / 2, math.pi, math.pi / 2]
            for k in range(4):
                v = pts[(k + 1) % 4] - pts[k]
                a = math.atan2(-v[1], v[0]) + expected_offsets[k]
                edge_angles.append(a)
            sines = np.mean([math.sin(a) for a in edge_angles])
            cosines = np.mean([math.cos(a) for a in edge_angles])
            heading = math.atan2(sines, cosines)
            # Side-of-cube rejection: a tilted (side-visible) marker has a
            # large angle spread.
            spread = np.std(
                [math.atan2(math.sin(a - heading), math.cos(a - heading)) for a in edge_angles]
            )
            if spread > math.radians(15):
                continue
            x, y = self.pixel_to_position(center[0], center[1])
            pose = {"position": (x, y), "heading": heading}
            if mid in ROBOT_MARKER_IDS:
                robot_poses[mid] = pose
            elif mid in CUBE_MARKER_IDS:
                cube_poses[mid] = pose
        return robot_poses, cube_poses


def render_debug_overlay(board, warped, robot_poses, cube_poses, debug_data):
    """Draw the env-supplied controller debug data onto a copy of the warped
    frame (reference aruco/server.py:118-145): detected poses, pure-pursuit
    lookahead circles, and turning-arc ellipses.

    ``debug_data``: iterable of per-robot payloads, each either None or
    ``(lookahead_xy, signed_radius_m, heading_err, position_xy, heading)``
    (the tuple RobotDriver.step publishes).  Returns the annotated image —
    pure so it is unit-testable without a GUI.
    """
    cv2 = _require_cv2()
    img = warped.copy()
    for pose in list(robot_poses.values()) + list(cube_poses.values()):
        cv2.circle(img, board.position_to_pixel(*pose["position"]), 6,
                   (0, 255, 0), 2)
    if not debug_data:
        return img
    for payload in debug_data:
        if payload is None:
            continue
        lookahead, signed_radius, heading_err, position, heading = payload
        if lookahead is not None:
            cv2.circle(img, board.position_to_pixel(*lookahead), 10,
                       (0, 0, 255), 2)
        if signed_radius is not None and position is not None:
            # Turning-arc ellipse (server.py:139-143): circle center sits
            # perpendicular to the heading at the signed radius.
            center = (
                position[0] - signed_radius * math.sin(heading),
                position[1] + signed_radius * math.cos(heading),
            )
            radius = int(abs(signed_radius) * 1000.0 * PIXELS_PER_MM)
            angle = math.degrees(-heading) + math.copysign(1, signed_radius) * 90
            end_angle = 2 * math.degrees(-heading_err)
            cv2.ellipse(img, board.position_to_pixel(*center),
                        (radius, radius), angle, 0, end_angle, (0, 0, 255), 2)
    return img


class PoseServer:
    """Accepts one env connection and answers pose requests
    (aruco/server.py:209-258): recv debug data (or None), send
    (robot_poses, cube_poses).  With ``debug=True`` the received controller
    payloads are rendered on the warped frame (server.py:118-145)."""

    def __init__(self, board, camera, port, x_offset=0.0, debug=False):
        self.board = board
        self.camera = camera
        self.port = port
        self.x_offset = x_offset  # large-board left/right remapping
        self.debug = debug

    def serve_forever(self):
        listener = Listener(("localhost", self.port), authkey=POSE_SERVER_AUTHKEY)
        print(f"pose server listening on :{self.port}")
        while True:
            conn = listener.accept()
            try:
                while True:
                    debug_data = conn.recv()  # waypoints etc. for overlay
                    t0 = time.time()
                    frame = self.camera.read()
                    if self.board.homography is None:
                        if not self.board.calibrate(frame):
                            conn.send((None, None))
                            continue
                    warped = self.board.warp(frame)
                    robot_poses, cube_poses = self.board.detect_poses(warped)
                    for pose in list(robot_poses.values()) + list(cube_poses.values()):
                        px, py = pose["position"]
                        pose["position"] = (px + self.x_offset, py)
                    conn.send((robot_poses, cube_poses))
                    if self.debug:  # pragma: no cover - GUI path
                        cv2 = _require_cv2()
                        img = render_debug_overlay(
                            self.board, warped, robot_poses, cube_poses,
                            debug_data,
                        )
                        cv2.imshow(f"poses:{self.port}", img)
                        cv2.waitKey(1)
                    print(f"served poses in {1000 * (time.time() - t0):.1f} ms")
            except EOFError:
                pass


def main():  # pragma: no cover - hardware entry point
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument("--board", choices=["small", "large_left", "large_right"],
                        default="small")
    parser.add_argument("--camera-index", type=int, default=0)
    args = parser.parse_args()
    port = {"small": 6000, "large_left": 6001, "large_right": 6002}[args.board]
    x_offset = {"small": 0.0, "large_left": -0.25, "large_right": 0.25}[args.board]
    length_mm = 1000 if args.board == "small" else 500
    board = Board(corner_ids=[42, 43, 44, 45], board_length_mm=length_mm,
                  board_width_mm=500)
    camera = LatestFrameCamera(args.camera_index)
    PoseServer(board, camera, port, x_offset).serve_forever()


if __name__ == "__main__":  # pragma: no cover
    main()
