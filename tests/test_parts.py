"""Parametric printable parts (real/parts.py).

The reference ships seven pre-built STLs (stl/); we generate functional
equivalents from the sim's dimensional constants.  These tests check each
generated mesh is a union of closed, outward-oriented shells and that the
part envelopes match the reference parts' documented sizes.
"""

import struct
from collections import Counter

import pytest

from spatial_intention_maps_tpu.real import parts


def read_stl(path):
    tris = []
    with open(path, "rb") as f:
        f.read(80)
        (n,) = struct.unpack("<I", f.read(4))
        for _ in range(n):
            vals = struct.unpack("<12f", f.read(48))
            f.read(2)
            tris.append(
                (tuple(vals[3:6]), tuple(vals[6:9]), tuple(vals[9:12]))
            )
    return tris


def signed_volume(tris):
    # Divergence theorem: V = sum over triangles of det(a, b, c) / 6.
    vol = 0.0
    for a, b, c in tris:
        vol += (
            a[0] * (b[1] * c[2] - b[2] * c[1])
            - a[1] * (b[0] * c[2] - b[2] * c[0])
            + a[2] * (b[0] * c[1] - b[1] * c[0])
        )
    return vol / 6.0


# Envelope specs (mm): (dx, dy, dz) of the reference parts.
ENVELOPES = {
    "cube": (44, 44, 44),
    "pushing-attachment": (60, None, 30),
    "lifting-attachment": (15, 41, 9),
    "throwing-attachment": (33, 50, 43.7),
    "rounded-corner": (50, 50, 44),
    "wall-support": (13, 44, 44),
    "board-corner": (48, 48, 70),
}


def flatten(shells):
    return [t for shell in shells for t in shell]


@pytest.mark.parametrize("name", sorted(parts.PARTS))
def test_part_is_closed_and_oriented(name, tmp_path):
    shells = parts.PARTS[name]()
    path = tmp_path / f"{name}.stl"
    parts.write_stl(path, flatten(shells))
    tris = read_stl(path)
    assert len(tris) >= 12

    # EVERY shell individually closed and outward-oriented — validating only
    # the total signed volume let an inverted sub-shell (a slicer void) hide
    # behind larger shells (round-4 pushing-attachment foot bug).
    for i, shell in enumerate(shells):
        edges = Counter()
        for a, b, c in shell:
            for u, v in ((a, b), (b, c), (c, a)):
                edges[(u, v)] += 1
        for (u, v), k in edges.items():
            assert edges[(v, u)] == k, f"{name} shell {i}: unmatched edge {u}->{v}"
        assert signed_volume(shell) > 0, f"{name} shell {i} is inverted"

    # The union strategy requires adjoining shells to genuinely overlap
    # (coincident faces are non-manifold): every shell must overlap at least
    # one other shell with positive volume on all three axes.
    def bbox(shell):
        pts = [p for t in shell for p in t]
        return tuple(
            (min(p[i] for p in pts), max(p[i] for p in pts)) for i in range(3)
        )

    if len(shells) > 1:
        boxes = [bbox(s) for s in shells]
        for i, bi in enumerate(boxes):
            overlaps = any(
                all(
                    min(bi[k][1], bj[k][1]) - max(bi[k][0], bj[k][0]) > 1e-6
                    for k in range(3)
                )
                for j, bj in enumerate(boxes)
                if j != i
            )
            assert overlaps, f"{name} shell {i} only touches its neighbors"

    # Aggregate orientation on the round-tripped STL too.
    assert signed_volume(tris) > 0, name


@pytest.mark.parametrize("name", sorted(parts.PARTS))
def test_part_envelope(name, tmp_path):
    path = tmp_path / f"{name}.stl"
    parts.write_stl(path, flatten(parts.PARTS[name]()))
    tris = read_stl(path)
    pts = [p for t in tris for p in t]
    dims = tuple(
        max(p[i] for p in pts) - min(p[i] for p in pts) for i in range(3)
    )
    for got, want in zip(dims, ENVELOPES[name]):
        if want is not None:
            assert got == pytest.approx(want, rel=0.02), (name, dims)


def test_cube_matches_sim_constant():
    from spatial_intention_maps_tpu import constants

    tris = flatten(parts.part_cube())
    zs = [p[2] for t in tris for p in t]
    assert max(zs) - min(zs) == pytest.approx(constants.CUBE_WIDTH * 1000)


def test_generate_all(tmp_path):
    out = parts.generate_all(tmp_path / "stl")
    assert len(out) == 7
    for p in out:
        assert p.stat().st_size > 84
