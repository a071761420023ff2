"""Parametric 3D-printable parts for the physical robot setup.

The reference ships seven pre-built STL meshes under ``stl/`` (cube,
lifting/pushing/throwing attachments, rounded corner, wall support, board
corner — reference README.md "building the real environment" section).
This module *generates* functionally equivalent parts from the same
dimensional constants the simulator uses (``constants.py``), so every
printed part stays in sync with the sim geometry by construction.  The
meshes are parametric originals, not copies: each part is composed from
closed axis-aligned-box and extruded-polygon shells (slicers union
overlapping closed shells), sized to the reference parts' envelopes.

Usage:
    python -m spatial_intention_maps_tpu.real.parts --out-dir stl/

All dimensions are millimeters (STL unit convention for printing).
"""

import argparse
import math
import struct
from pathlib import Path

from .. import constants

MM = 1000.0  # constants.py is in meters

CUBE_MM = constants.CUBE_WIDTH * MM                 # 44
BLADE_WIDTH_MM = 2 * constants.ROBOT_HALF_WIDTH * MM  # 60 (pushing blade span)
# Shells that only adjoin are extended into each other by this much so the
# union strategy ("slicers union overlapping closed shells") actually holds;
# coincident-face shells are non-manifold and slicer-dependent.
OVERLAP_MM = 0.1


# ---------------------------------------------------------------------------
# Minimal binary-STL solid modeling: triangle soups of closed shells.
# ---------------------------------------------------------------------------

def _normal(a, b, c):
    ux, uy, uz = (b[0] - a[0], b[1] - a[1], b[2] - a[2])
    vx, vy, vz = (c[0] - a[0], c[1] - a[1], c[2] - a[2])
    n = (uy * vz - uz * vy, uz * vx - ux * vz, ux * vy - uy * vx)
    l = math.sqrt(n[0] ** 2 + n[1] ** 2 + n[2] ** 2) or 1.0
    return (n[0] / l, n[1] / l, n[2] / l)


def box(x0, y0, z0, x1, y1, z1):
    """Closed axis-aligned box shell as 12 outward-facing triangles.

    Bounds are normalized per axis so argument order can never produce an
    inverted (inward-facing) shell, which slicers treat as a void."""
    x0, x1 = min(x0, x1), max(x0, x1)
    y0, y1 = min(y0, y1), max(y0, y1)
    z0, z1 = min(z0, z1), max(z0, z1)
    v = [(x, y, z) for x in (x0, x1) for y in (y0, y1) for z in (z0, z1)]
    # indices: bit2=x, bit1=y, bit0=z
    quads = [
        (0, 1, 3, 2),  # -x
        (4, 6, 7, 5),  # +x
        (0, 4, 5, 1),  # -y
        (2, 3, 7, 6),  # +y
        (0, 2, 6, 4),  # -z
        (1, 5, 7, 3),  # +z
    ]
    tris = []
    for a, b, c, d in quads:
        tris.append((v[a], v[b], v[c]))
        tris.append((v[a], v[c], v[d]))
    return tris


def extrude(poly, z0, z1):
    """Extrude a simple CCW polygon [(x, y), ...] from z0 to z1.

    Caps are fan-triangulated from ``poly[0]``; the polygon must be
    star-shaped as seen from that vertex (true for the concave fillet
    profile, whose every arc point is visible from the corner vertex).
    """
    n = len(poly)
    tris = []
    for i in range(n):  # side walls
        (ax, ay), (bx, by) = poly[i], poly[(i + 1) % n]
        a0, b0 = (ax, ay, z0), (bx, by, z0)
        a1, b1 = (ax, ay, z1), (bx, by, z1)
        tris.append((a0, b0, b1))
        tris.append((a0, b1, a1))
    for i in range(1, n - 1):  # caps fanned from poly[0]
        a, b, c = poly[0], poly[i], poly[i + 1]
        tris.append(((a[0], a[1], z1), (b[0], b[1], z1), (c[0], c[1], z1)))
        tris.append(((a[0], a[1], z0), (c[0], c[1], z0), (b[0], b[1], z0)))
    return tris


def write_stl(path, tris, name=b"sim-tpu parametric part"):
    with open(path, "wb") as f:
        f.write(name.ljust(80, b"\0"))
        f.write(struct.pack("<I", len(tris)))
        for a, b, c in tris:
            f.write(struct.pack("<12f", *_normal(a, b, c), *a, *b, *c))
            f.write(struct.pack("<H", 0))


# ---------------------------------------------------------------------------
# The seven parts (reference stl/ directory; envelopes from the shipped
# meshes, dimensions tied to constants.py where the sim uses them).
# ---------------------------------------------------------------------------

def part_cube():
    """44 mm foam-core cube shell (reference stl/cube.stl; CUBE_WIDTH).

    Printed as a closed cube; ArUco marker sheets from real/markers.py glue
    onto the faces (marker ids 10-33)."""
    h = CUBE_MM / 2
    return [box(-h, -h, 0, h, h, CUBE_MM)]


def part_pushing_attachment():
    """Flat pushing blade (reference stl/pushing-attachment.stl): spans the
    robot's full width (2*ROBOT_HALF_WIDTH = 60 mm — the sim's blade contact
    segment in envs/dynamics.py), 5 mm thick, 30 mm tall, with a mounting
    foot that clips over the Vector's bumper."""
    w = BLADE_WIDTH_MM / 2
    return [
        box(-w, -2.5, 0, w, 2.5, 30),                     # blade
        box(-10, -12.5, 0, 10, -2.5 + OVERLAP_MM, 4),     # foot plate toward robot
        box(-10, -12.5, 0, 10, -10.5, 10),                # clip lip
    ]


def part_lifting_attachment():
    """Fork hooks for the lifting robots (reference
    stl/lifting-attachment.stl, 15 x 41 x 9 mm envelope): a back bar that
    bolts to Vector's lift arm plus two forward prongs; the prong gap is
    sized so a CUBE_WIDTH cube seats between neighboring robots' hooks."""
    return [
        box(-7, -20.5, 0, -4, 20.5, 9),                   # back bar (3 mm)
        box(-4 - OVERLAP_MM, -20.5, 0, 8, -16.5, 9),      # left prong
        box(-4 - OVERLAP_MM, 16.5, 0, 8, 20.5, 9),        # right prong
    ]


def part_throwing_attachment():
    """Open-top throwing scoop (reference stl/throwing-attachment.stl,
    33 x 50 x 44 mm envelope): floor + back wall + two side walls; the cube
    rests on the floor and leaves over the back wall when the lift flicks
    (sim counterpart: the ballistic throw in envs/dynamics.py)."""
    return [
        box(-17, -25, 0, 16, 25, 3),                      # floor
        box(-17, -25, 0, 16, -21, 43.7),                  # back wall (toward robot)
        box(-17, -25, 0, -14, 25, 20),                    # left wall
        box(13, -25, 0, 16, 25, 20),                      # right wall
    ]


def part_rounded_corner(radius=50.0, height=CUBE_MM, samples=12):
    """Concave quarter-cylinder fillet insert for wall/divider junctions
    (reference stl/rounded-corner.stl + assets/rounded_corner.obj; the sim's
    analytic fillets in envs/geometry.py use the same profile).  The profile
    is the corner square minus the quarter-disc centered at (r, r): the
    solid between the sharp 90-degree corner and the concave arc.  Fanned
    from the corner vertex (every arc point is visible from it)."""
    # Arc from (r, 0) to (0, r) around center (r, r), CCW boundary order.
    arc = [
        (radius + radius * math.cos(t), radius + radius * math.sin(t))
        for t in (
            -math.pi / 2 - i * (math.pi / 2) / samples for i in range(samples + 1)
        )
    ]
    poly = [(0.0, 0.0)] + arc
    return [extrude(poly, 0, height)]


def part_wall_support(height=CUBE_MM):
    """L-bracket that holds the foam walls upright (reference
    stl/wall-support.stl, 13 x 44 x 44 mm envelope): vertical plate against
    the wall + base foot on the table.  Height is CUBE_MM (44), matching the
    reference part's envelope — the bracket braces the wall's base, it does
    not span the full 100 mm WALL_HEIGHT."""
    return [
        box(-20, -20, 0, -16, 24, height),                # vertical plate
        box(-16 - OVERLAP_MM, -20, 0, -7, 24, 4),         # base foot
    ]


def part_board_corner(height=70.0):
    """Corner post that registers the ArUco board on the table (reference
    stl/board-corner.stl, 48 x 48 x 70 mm): two walls meeting at a right
    angle with a base plate; the board corner slots into the inside angle."""
    return [
        box(-24, -24, 0, 24, -18, height),                # wall along x
        box(-24, -24, 0, -18, 24, height),                # wall along y
        box(-24, -24, 0, 24, 24, 4),                      # base plate
    ]


# Each part function returns a LIST of closed shells (so tests can validate
# orientation per shell, not just in aggregate — an inverted sub-shell must
# not hide behind a larger one).
PARTS = {
    "cube": part_cube,
    "pushing-attachment": part_pushing_attachment,
    "lifting-attachment": part_lifting_attachment,
    "throwing-attachment": part_throwing_attachment,
    "rounded-corner": part_rounded_corner,
    "wall-support": part_wall_support,
    "board-corner": part_board_corner,
}


def generate_all(out_dir):
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    paths = []
    for name, fn in PARTS.items():
        path = out_dir / f"{name}.stl"
        write_stl(path, [t for shell in fn() for t in shell])
        paths.append(path)
    return paths


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--out-dir", default="stl")
    args = parser.parse_args()
    for path in generate_all(args.out_dir):
        print(path)


if __name__ == "__main__":
    main()
