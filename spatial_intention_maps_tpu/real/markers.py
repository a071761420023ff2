"""Marker / board generation and camera calibration tools
(aruco/create_markers.py, create_charuco_board.py, calibrate_charuco.py role
parity).  All hardware/print tooling is host-side and import-gated."""

from pathlib import Path

import numpy as np

from . import CUBE_MARKER_IDS, ROBOT_MARKER_IDS

BOARD_CORNER_IDS = [42, 43, 44, 45]
MARKER_SIZE_MM = 18.0


def _cv2():
    import cv2
    import cv2.aruco  # noqa: F401

    return cv2


def generate_marker_images(output_dir="markers", pixels=200):
    """PNG images for every robot/cube/board-corner marker (DICT_4X4_50)."""
    cv2 = _cv2()
    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)
    dictionary = cv2.aruco.getPredefinedDictionary(cv2.aruco.DICT_4X4_50)
    for mid in ROBOT_MARKER_IDS + CUBE_MARKER_IDS + BOARD_CORNER_IDS:
        img = cv2.aruco.generateImageMarker(dictionary, mid, pixels)
        cv2.imwrite(str(out / f"marker_{mid:02d}.png"), img)
    return out


def generate_charuco_board(output_path="charuco_board.png", squares=(10, 7),
                           square_px=120):
    """ChArUco calibration board image (create_charuco_board.py parity)."""
    cv2 = _cv2()
    dictionary = cv2.aruco.getPredefinedDictionary(cv2.aruco.DICT_5X5_100)
    board = cv2.aruco.CharucoBoard(squares, 0.024, 0.018, dictionary)
    img = board.generateImage((squares[0] * square_px, squares[1] * square_px))
    cv2.imwrite(str(output_path), img)
    return output_path


def calibrate_charuco(image_paths, squares=(10, 7)):
    """Camera intrinsics from ChArUco captures (calibrate_charuco.py parity).

    Returns (camera_matrix, dist_coeffs, rms_error).
    """
    cv2 = _cv2()
    dictionary = cv2.aruco.getPredefinedDictionary(cv2.aruco.DICT_5X5_100)
    board = cv2.aruco.CharucoBoard(squares, 0.024, 0.018, dictionary)
    detector = cv2.aruco.CharucoDetector(board)

    all_corners, all_ids = [], []
    image_size = None
    for path in image_paths:
        img = cv2.imread(str(path), cv2.IMREAD_GRAYSCALE)
        if img is None:
            continue
        image_size = img.shape[::-1]
        corners, ids, _, _ = detector.detectBoard(img)
        if corners is not None and len(corners) > 4:
            all_corners.append(corners)
            all_ids.append(ids)
    if not all_corners:
        raise RuntimeError("no ChArUco corners detected in any image")
    rms, cam, dist, _, _ = cv2.aruco.calibrateCameraCharuco(
        all_corners, all_ids, board, image_size, None, None
    )
    return cam, dist, rms


def detect_markers_live(camera_index=0):  # pragma: no cover - hardware
    """Live detection sanity check (aruco/detect_markers.py parity)."""
    cv2 = _cv2()
    dictionary = cv2.aruco.getPredefinedDictionary(cv2.aruco.DICT_4X4_50)
    detector = cv2.aruco.ArucoDetector(dictionary)
    cap = cv2.VideoCapture(camera_index)
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        corners, ids, _ = detector.detectMarkers(frame)
        vis = cv2.aruco.drawDetectedMarkers(frame.copy(), corners, ids)
        cv2.imshow("markers", vis)
        if cv2.waitKey(1) in (27, ord("q")):
            break
    cap.release()
    cv2.destroyAllWindows()
