"""Wavefront OBJ loading with the reference parser's semantics.

The reference parser (reference: source/Utils.h:377-451) reads only ``v`` and
``f`` records, takes the first '/'-delimited field of each face index (Maya
style), converts 1-based to 0-based, and recomputes per-face normals as
``normalize(cross(v1-v0, v2-v0))``.  Everything else is skipped.

A fast C++ implementation lives in raytpu.native; this module is the pure
Python fallback plus the shared asset-path resolution.
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np

#: Directories searched for OBJ assets, in order: RAYTPU_ASSETS override,
#: then the bundled assets (the course meshes ship with the package), then an
#: optional extra directory (e.g. a reference checkout's Resources) via
#: RAYTPU_EXTRA_ASSETS.
_ASSET_DIRS = [
    os.environ.get("RAYTPU_ASSETS", ""),
    str(Path(__file__).resolve().parent.parent / "assets"),
    os.environ.get("RAYTPU_EXTRA_ASSETS", ""),
]


def resolve_asset(filename: str) -> str:
    p = Path(filename)
    if p.is_file():
        return str(p)
    for d in _ASSET_DIRS:
        if d and (Path(d) / filename).is_file():
            return str(Path(d) / filename)
    raise FileNotFoundError(f"OBJ asset not found: {filename} (searched {_ASSET_DIRS})")


def parse_obj(path: str, use_native: bool = True):
    """Parse an OBJ file.

    Returns ``(positions (V,3) f32, normals (F,3) f32, indices (3F,) i32)``
    with per-face normals, mirroring ``Utils::ParseOBJ``.
    """
    path = resolve_asset(path)
    if use_native:
        try:
            from raytpu.native import runtime as _rt

            if _rt.available():
                return _rt.parse_obj(path)
        except Exception:
            pass
    return _parse_obj_py(path)


def _parse_obj_py(path: str):
    positions: list[tuple[float, float, float]] = []
    indices: list[int] = []
    with open(path, "r", errors="replace") as f:
        for line in f:
            parts = line.split()
            if not parts:
                continue
            cmd = parts[0]
            if cmd == "v" and len(parts) >= 4:
                positions.append((float(parts[1]), float(parts[2]), float(parts[3])))
            elif cmd == "f" and len(parts) >= 4:
                # first '/'-field, 1-based -> 0-based; parsed via float like the
                # reference's stof (reference: source/Utils.h:404-416)
                for tok in parts[1:4]:
                    indices.append(int(float(tok.split("/", 1)[0])) - 1)
    pos = np.asarray(positions, np.float32).reshape(-1, 3)
    idx = np.asarray(indices, np.int32)
    tri = idx.reshape(-1, 3)
    v = pos[tri]
    n = np.cross(v[:, 1] - v[:, 0], v[:, 2] - v[:, 0])
    norm = np.linalg.norm(n, axis=-1, keepdims=True)
    n = (n / norm).astype(np.float32)
    return pos, n, idx
