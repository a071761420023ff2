"""Marker / board generation and camera calibration tools
(aruco/create_markers.py, create_charuco_board.py, calibrate_charuco.py role
parity).  All hardware/print tooling is host-side and import-gated."""

from pathlib import Path

import numpy as np

from . import CUBE_MARKER_IDS, ROBOT_MARKER_IDS

BOARD_CORNER_IDS = [42, 43, 44, 45]
MARKER_SIZE_MM = 18.0
RECEPTACLE_MM = 150.0


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


def generate_marker_sheets(output_path="marker_sheets.pdf", paper="letter",
                           bitmap_fn=None):
    """Printable marker sheets at true physical size (aruco/printouts parity).

    Lays out every robot/cube/board-corner marker on paper-sized PDF pages
    with MARKER_SIZE_MM squares, white quiet zones, and id labels, so the
    sheet can be printed at 100% scale and cut out.  ``bitmap_fn(mid) ->
    (n, n) 0/1 array`` defaults to the cv2 DICT_4X4_50 bitmap (import-gated;
    pass a custom fn for testing without cv2).
    """
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.backends.backend_pdf import PdfPages

    if bitmap_fn is None:
        cv2 = _cv2()
        dictionary = cv2.aruco.getPredefinedDictionary(cv2.aruco.DICT_4X4_50)

        def bitmap_fn(mid):
            img = cv2.aruco.generateImageMarker(dictionary, mid, 6)
            return (np.asarray(img) > 127).astype(np.uint8)

    page_w, page_h = (8.5, 11.0) if paper == "letter" else (8.27, 11.69)  # in
    size_in = MARKER_SIZE_MM / 25.4
    quiet = size_in * 0.5  # white border so detection works after cutting
    cell = size_in + 2 * quiet + 0.25
    cols = max(1, int((page_w - 1.0) // cell))
    rows = max(1, int((page_h - 1.0) // cell))
    per_page = cols * rows

    ids = list(ROBOT_MARKER_IDS) + list(CUBE_MARKER_IDS) + BOARD_CORNER_IDS
    with PdfPages(output_path) as pdf:
        for start in range(0, len(ids), per_page):
            fig = plt.figure(figsize=(page_w, page_h))
            for k, mid in enumerate(ids[start:start + per_page]):
                r, c = divmod(k, cols)
                x0 = (0.5 + c * cell + quiet) / page_w
                y0 = 1.0 - (0.5 + (r + 1) * cell - quiet) / page_h
                ax = fig.add_axes([x0, y0, size_in / page_w, size_in / page_h])
                ax.imshow(bitmap_fn(mid), cmap="gray", vmin=0, vmax=1,
                          interpolation="nearest")
                ax.set_xticks([]); ax.set_yticks([])
                ax.set_title(f"id {mid}", fontsize=6, pad=2)
            pdf.savefig(fig)
            plt.close(fig)
    return output_path


def _mm_page(paper="letter", landscape=False):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    w_in, h_in = (8.5, 11.0) if paper == "letter" else (8.27, 11.69)
    if landscape:
        w_in, h_in = h_in, w_in
    fig = plt.figure(figsize=(w_in, h_in))
    ax = fig.add_axes([0, 0, 1, 1])
    ax.set_xlim(0, w_in * 25.4)
    ax.set_ylim(0, h_in * 25.4)
    ax.set_aspect("equal")
    ax.axis("off")
    return plt, fig, ax, (w_in * 25.4, h_in * 25.4)


def generate_receptacle_target(output_path="receptacle.pdf"):
    """Dashed 150 mm receptacle outline at true print scale
    (printouts/create_target_receptacle.py parity; matplotlib, not fpdf)."""
    plt, fig, ax, (W, H) = _mm_page(landscape=True)
    side = RECEPTACLE_MM
    half = side / 2.0
    xs = [W / 2 - half, W / 2 + half, W / 2 + half, W / 2 - half, W / 2 - half]
    ys = [H / 2 - half, H / 2 - half, H / 2 + half, H / 2 + half, H / 2 - half]
    ax.plot(xs, ys, linestyle=(0, (6, 8)), linewidth=5, color="black",
            solid_capstyle="butt")
    fig.savefig(output_path, format="pdf")
    plt.close(fig)
    return output_path


def generate_back_covers(output_path="back-covers.pdf", rows=5, cols=2):
    """Fold-template sheets for the robots' marker back covers
    (printouts/create_back_covers.py parity): 75 x 47 mm templates with fold
    lines for the 45 mm top face the marker mounts on."""
    plt, fig, ax, (W, H) = _mm_page()
    tw, th = 75.0, 47.0
    margin, side_margin = 12.7, 19.0
    gap_x = (W - 2 * side_margin - cols * tw) / (cols + 1)
    gap_y = (H - 2 * margin - rows * th) / (rows + 1)

    def template(x, y):
        lw = 0.3
        ax.plot([x, x + tw, x + tw, x, x], [y, y, y + th, y + th, y],
                color="black", linewidth=lw)
        ax.plot([x, x + tw], [y + 28, y + 28], color="black", linewidth=lw)
        for fx in (15.0, 60.0):
            ax.plot([x + fx, x + fx], [y, y + th], color="black", linewidth=lw)
        ax.plot([x + 15 + 45 / 2] * 2, [y, y + 3], color="black", linewidth=lw)
        for tx in (x + 15 + (45 - 12) / 2, x + 60 - (45 - 12) / 2):
            ax.plot([tx, tx], [y + th, y + th - 3], color="black", linewidth=lw)

    for r in range(rows):
        for c in range(cols):
            template(side_margin + gap_x + c * (tw + gap_x),
                     margin + gap_y + r * (th + gap_y))
    fig.savefig(output_path, format="pdf")
    plt.close(fig)
    return output_path
