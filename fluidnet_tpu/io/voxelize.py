"""OBJ mesh voxelizer (replaces voxelizer/generate_binvox_files.py + the
external `binvox` binary, SURVEY.md §2.2 "Voxelizer").

The reference shells out to Patrick Min's binvox to rasterize NTU OBJ
models into occupancy grids at 8-256^3 and splits them into train/test by
a shuffled file list. This module does the whole job in-process:

  1. parse the OBJ (v/f records, fan-triangulation of polygons),
  2. surface voxelization: barycentric supersampling of every triangle
     (~2 samples per voxel edge, conservative),
  3. solid fill: exterior flood fill on the complement (the native C++
     fill from fluidnet_tpu.native when built, NumPy dilation otherwise);
     everything not reachable from outside becomes solid.

Outputs match io.binvox's dict convention ((x, y, z) occupancy + metadata)
and can be written as .binvox for interchange.
"""

import os

import numpy as np


def load_obj(path):
    """Returns (vertices (n, 3) float32, triangles (m, 3) int32)."""
    verts = []
    tris = []
    with open(path) as f:
        for line in f:
            if line.startswith("v "):
                parts = line.split()
                verts.append([float(parts[1]), float(parts[2]),
                              float(parts[3])])
            elif line.startswith("f "):
                idx = []
                for tok in line.split()[1:]:
                    v = tok.split("/")[0]
                    i = int(v)
                    idx.append(i - 1 if i > 0 else len(verts) + i)
                for k in range(1, len(idx) - 1):  # fan triangulation
                    tris.append([idx[0], idx[k], idx[k + 1]])
    return (np.asarray(verts, np.float32), np.asarray(tris, np.int32))


def _surface_voxels(verts, tris, dim):
    """Conservative surface rasterization by triangle supersampling."""
    occ = np.zeros((dim, dim, dim), bool)
    lo = verts.min(axis=0)
    hi = verts.max(axis=0)
    extent = float((hi - lo).max())
    if extent <= 0:
        raise ValueError("degenerate mesh")
    # binvox-style: fit the longest axis into [0, dim] with small margin.
    scale = (dim - 2) / extent
    v = (verts - lo) * scale + 1.0

    a, b, c = v[tris[:, 0]], v[tris[:, 1]], v[tris[:, 2]]
    # samples per triangle proportional to its voxel-space size.
    edge = np.maximum(np.linalg.norm(b - a, axis=1),
                      np.maximum(np.linalg.norm(c - a, axis=1),
                                 np.linalg.norm(c - b, axis=1)))
    for t in range(len(tris)):
        n = max(int(np.ceil(edge[t] * 2)) + 1, 2)
        # barycentric lattice u + v <= 1
        us = np.linspace(0, 1, n)
        uu, vv = np.meshgrid(us, us)
        m = uu + vv <= 1.0
        uu, vv = uu[m], vv[m]
        pts = (a[t][None] * (1 - uu - vv)[:, None] +
               b[t][None] * uu[:, None] + c[t][None] * vv[:, None])
        idx = np.clip(pts.astype(np.int32), 0, dim - 1)
        occ[idx[:, 0], idx[:, 1], idx[:, 2]] = True
    return occ


def _fill_interior(surface):
    """Marks everything not reachable from the outside as solid."""
    dim = surface.shape[0]
    try:
        from fluidnet_tpu.native import flood_fill_native
        # Treat non-surface cells as "fluid" (bit 0) and label components;
        # any component touching the boundary is exterior.
        flags = np.where(surface, 0, 1).astype(np.int32)
        out = flood_fill_native(flags[None, None])
        if out is not None:
            labels = out[0][0, 0]
            boundary_labels = np.unique(np.concatenate([
                labels[0].ravel(), labels[-1].ravel(),
                labels[:, 0].ravel(), labels[:, -1].ravel(),
                labels[:, :, 0].ravel(), labels[:, :, -1].ravel()]))
            boundary_labels = boundary_labels[boundary_labels >= 0]
            exterior = np.isin(labels, boundary_labels)
            return surface | (~surface & ~exterior)
    except Exception:
        pass
    # NumPy fallback: iterative dilation of the exterior.
    free = ~surface
    ext = np.zeros_like(free)
    ext[0], ext[-1] = free[0], free[-1]
    ext[:, 0], ext[:, -1] = ext[:, 0] | free[:, 0], ext[:, -1] | free[:, -1]
    ext[:, :, 0] |= free[:, :, 0]
    ext[:, :, -1] |= free[:, :, -1]
    for _ in range(3 * dim):
        grown = ext.copy()
        grown[1:] |= ext[:-1]
        grown[:-1] |= ext[1:]
        grown[:, 1:] |= ext[:, :-1]
        grown[:, :-1] |= ext[:, 1:]
        grown[:, :, 1:] |= ext[:, :, :-1]
        grown[:, :, :-1] |= ext[:, :, 1:]
        grown &= free
        if (grown == ext).all():
            break
        ext = grown
    return surface | (~surface & ~ext)


def voxelize_obj(path, dim: int = 32, solid: bool = True):
    """Voxelizes an OBJ file. Returns dict(data (x, y, z) float {0,1},
    dims, translation, scale) like io.binvox.load_binvox."""
    verts, tris = load_obj(path)
    occ = _surface_voxels(verts, tris, dim)
    if solid:
        occ = _fill_interior(occ)
    lo = verts.min(axis=0)
    extent = float((verts.max(axis=0) - lo).max())
    return {"data": occ.astype(np.float32), "dims": [dim, dim, dim],
            "translation": [float(x) for x in lo],
            "scale": extent}


def save_binvox(path, vox):
    """Writes a voxelize_obj/load_binvox dict as a .binvox file (RLE)."""
    data = vox["data"] > 0.5
    # binvox native nesting is [x][z][y] (see io.binvox).
    flat = np.ascontiguousarray(data.transpose(0, 2, 1)).reshape(-1)
    out = bytearray()
    i = 0
    n = len(flat)
    while i < n:
        v = bool(flat[i])
        run = 1
        while i + run < n and bool(flat[i + run]) == v and run < 255:
            run += 1
        out += bytes([int(v), run])
        i += run
    d = vox["dims"]
    with open(path, "wb") as f:
        f.write(b"#binvox 1\n")
        f.write(f"dim {d[0]} {d[1]} {d[2]}\n".encode())
        t = vox.get("translation") or [0, 0, 0]
        f.write(f"translate {t[0]} {t[1]} {t[2]}\n".encode())
        f.write(f"scale {vox.get('scale', 1.0)}\n".encode())
        f.write(b"data\n")
        f.write(bytes(out))


def generate_voxel_files(obj_dir, out_dir, dims=(16, 32, 64), test_frac=0.2,
                         seed=0):
    """generate_binvox_files.py equivalent: voxelize every OBJ under
    obj_dir at several resolutions and split train/test by a shuffled file
    list (voxelizer/generate_binvox_files.py:47-85)."""
    objs = sorted(f for f in os.listdir(obj_dir) if f.endswith(".obj"))
    rng = np.random.default_rng(seed)
    order = rng.permutation(len(objs))
    n_test = int(len(objs) * test_frac)
    split = {objs[i]: ("te" if rank < n_test else "tr")
             for rank, i in enumerate(order)}
    written = []
    for name in objs:
        for dim in dims:
            vox = voxelize_obj(os.path.join(obj_dir, name), dim=dim)
            sub = os.path.join(out_dir, split[name])
            os.makedirs(sub, exist_ok=True)
            out = os.path.join(sub, f"{os.path.splitext(name)[0]}_{dim}.binvox")
            save_binvox(out, vox)
            written.append(out)
    return written
