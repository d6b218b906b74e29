"""Reconstruct the Taichi cloth mesh's missing plane.obj.

taichi-version/main.py:83 loads asset/plane.obj (441 vertices, the
cloth whose per-frame positions live in asset/points/{1..300}.txt), but
the file is ABSENT from the reference repo — its own animation loop
cannot run as checked in. Frame 1 is the flat rest pose: a 21x21 grid
on z=0, so the topology is recoverable exactly: assign each point its
(row, col) grid cell by normalized rounding, verify the assignment is
a bijection, and emit the standard grid triangulation with
UV = (col/20, row/20).
"""
import sys, os
import numpy as np

ref = "/root/reference/taichi-version/asset/points/1.txt"
pts = np.loadtxt(ref)
assert pts.shape == (441, 3), pts.shape
x, y = pts[:, 0], pts[:, 1]
col = np.round((x - x.min()) / (x.max() - x.min()) * 20).astype(int)
row = np.round((y - y.min()) / (y.max() - y.min()) * 20).astype(int)
cells = row * 21 + col
assert len(set(cells.tolist())) == 441, "grid assignment not bijective"

out = sys.argv[1] if len(sys.argv) > 1 else "scenes/plane441.obj"
with open(out, "w") as f:
    f.write("# reconstructed 21x21 cloth grid (reference plane.obj is "
            "missing from its repo); vertex order matches points/*.txt\n")
    for px, py, pz in pts:
        f.write(f"v {px:.9f} {py:.9f} {pz:.9f}\n")
    for i in range(441):
        f.write(f"vt {col[i] / 20.0:.6f} {row[i] / 20.0:.6f}\n")
    # faces indexed by grid cell -> original point index
    idx_of = np.full((21, 21), -1, int)
    for i in range(441):
        idx_of[row[i], col[i]] = i
    for r in range(20):
        for c in range(20):
            a = idx_of[r, c] + 1
            b = idx_of[r, c + 1] + 1
            cidx = idx_of[r + 1, c + 1] + 1
            d = idx_of[r + 1, c] + 1
            f.write(f"f {a}/{a} {b}/{b} {cidx}/{cidx}\n")
            f.write(f"f {a}/{a} {cidx}/{cidx} {d}/{d}\n")
print(f"wrote {out}: 441 verts, 800 faces")
