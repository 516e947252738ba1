"""Gaussian-splat PLY IO (self-contained; no plyfile dependency).

Reads/writes the standard 3D-GS vertex layout:
  x y z nx ny nz f_dc_{0..2} f_rest_{...} opacity scale_{0..2} rot_{0..3}

``load_gaussians`` reproduces the reference's load-time asset transform
(gaussian_4d.py:177-306): rotate by rot_x then rot_z, scale positions and
linear scales, and rotate the per-gaussian quaternions by the same world
rotation (the "blurry renderings" fix at gaussian_4d.py:257-260).
"""

from __future__ import annotations

import re
from typing import Dict, Tuple

import numpy as np

from animate3d_tpu.gaussians.state import GaussianState
from animate3d_tpu.utils.rotation import matrix_to_quat_np, quat_to_matrix_np

_PLY_DTYPES = {
    "float": "f4", "float32": "f4", "double": "f8", "float64": "f8",
    "uchar": "u1", "uint8": "u1", "char": "i1", "int8": "i1",
    "short": "i2", "ushort": "u2", "int": "i4", "int32": "i4",
    "uint": "u4", "uint32": "u4",
}


def read_ply_vertices(path: str) -> Dict[str, np.ndarray]:
    """Parse the 'vertex' element of an ascii or binary_little_endian PLY."""
    with open(path, "rb") as f:
        header_lines = []
        while True:
            line = f.readline().decode("ascii").strip()
            header_lines.append(line)
            if line == "end_header":
                break
        fmt = None
        elements = []  # (name, count, [(prop_name, dtype)])
        for line in header_lines:
            if line.startswith("format"):
                fmt = line.split()[1]
            elif line.startswith("element"):
                _, name, count = line.split()
                elements.append((name, int(count), []))
            elif line.startswith("property"):
                parts = line.split()
                if parts[1] == "list":
                    elements[-1][2].append((parts[-1], None))  # list prop (faces)
                else:
                    elements[-1][2].append((parts[2], _PLY_DTYPES[parts[1]]))

        if fmt not in ("ascii", "binary_little_endian"):
            raise ValueError(f"Unsupported PLY format {fmt}")

        out: Dict[str, np.ndarray] = {}
        for name, count, props in elements:
            if any(dt is None for _, dt in props):
                raise ValueError("List properties unsupported in gaussian PLY reader")
            dtype = np.dtype([(p, dt) for p, dt in props])
            if fmt == "ascii":
                rows = []
                for _ in range(count):
                    rows.append(tuple(float(tok) for tok in f.readline().split()))
                data = np.array(rows, dtype=dtype)
            else:
                data = np.frombuffer(f.read(count * dtype.itemsize), dtype=dtype, count=count)
            if name == "vertex":
                for p, _ in props:
                    out[p] = np.ascontiguousarray(data[p])
        if not out:
            raise ValueError(f"No vertex element found in {path}")
        return out


def write_gaussian_ply(path: str, state: GaussianState) -> None:
    xyz = np.asarray(state.xyz, np.float32)
    n = xyz.shape[0]
    normals = np.zeros_like(xyz)
    f_dc = np.asarray(state.features_dc, np.float32).reshape(n, -1)
    f_rest = np.asarray(state.features_rest, np.float32)
    # reference layout: (N, 3*(K-1)) ordered channel-major (transpose of (K-1, 3))
    f_rest = f_rest.transpose(0, 2, 1).reshape(n, -1)
    opacity = np.asarray(state.opacity, np.float32).reshape(n, 1)
    scaling = np.asarray(state.scaling, np.float32)
    rotation = np.asarray(state.rotation, np.float32)

    props = (["x", "y", "z", "nx", "ny", "nz"]
             + [f"f_dc_{i}" for i in range(f_dc.shape[1])]
             + [f"f_rest_{i}" for i in range(f_rest.shape[1])]
             + ["opacity"]
             + [f"scale_{i}" for i in range(3)]
             + [f"rot_{i}" for i in range(4)])
    data = np.concatenate([xyz, normals, f_dc, f_rest, opacity, scaling, rotation], axis=1)
    rec = np.rec.fromarrays(data.T.astype(np.float32), names=props,
                            formats=["f4"] * len(props))
    with open(path, "wb") as f:
        header = ["ply", "format binary_little_endian 1.0", f"element vertex {n}"]
        header += [f"property float {p}" for p in props]
        header += ["end_header"]
        f.write(("\n".join(header) + "\n").encode("ascii"))
        f.write(rec.tobytes())


def read_gaussian_ply(path: str, max_sh_degree: int = 0) -> GaussianState:
    v = read_ply_vertices(path)
    n = v["x"].shape[0]
    xyz = np.stack([v["x"], v["y"], v["z"]], axis=1).astype(np.float32)
    opacity = v["opacity"].astype(np.float32)[:, None]
    f_dc = np.stack([v["f_dc_0"], v["f_dc_1"], v["f_dc_2"]], axis=1).astype(np.float32)[:, None, :]

    rest_names = sorted((k for k in v if k.startswith("f_rest_")),
                        key=lambda s: int(s.split("_")[-1]))
    if max_sh_degree > 0:
        k_rest = (max_sh_degree + 1) ** 2 - 1
        assert len(rest_names) == 3 * k_rest, (len(rest_names), k_rest)
        f_rest = np.stack([v[nm] for nm in rest_names], axis=1).astype(np.float32)
        f_rest = f_rest.reshape(n, 3, k_rest).transpose(0, 2, 1)
    else:
        f_rest = np.zeros((n, 0, 3), dtype=np.float32)

    scale_names = sorted((k for k in v if k.startswith("scale_")),
                         key=lambda s: int(s.split("_")[-1]))
    scaling = np.stack([v[nm] for nm in scale_names], axis=1).astype(np.float32)
    rot_names = sorted((k for k in v if re.fullmatch(r"rot_\d+", k)),
                       key=lambda s: int(s.split("_")[-1]))
    rotation = np.stack([v[nm] for nm in rot_names], axis=1).astype(np.float32)

    return GaussianState(xyz, f_dc, f_rest, opacity, scaling, rotation,
                         sh_degree=max_sh_degree)


def asset_transform_matrix(rot_x_degree: float, rot_z_degree: float) -> np.ndarray:
    """World rotation applied at asset load: Rz @ Rx (gaussian_4d.py:181-196)."""
    tx = np.deg2rad(rot_x_degree)
    tz = np.deg2rad(rot_z_degree)
    rx = np.array([[1, 0, 0],
                   [0, np.cos(tx), -np.sin(tx)],
                   [0, np.sin(tx), np.cos(tx)]])
    rz = np.array([[np.cos(tz), -np.sin(tz), 0],
                   [np.sin(tz), np.cos(tz), 0],
                   [0, 0, 1]])
    return rz @ rx


def load_gaussians(
    path: str,
    rot_x_degree: float = 0.0,
    rot_z_degree: float = 0.0,
    scale_factor: float = 1.0,
    max_sh_degree: int = 0,
) -> GaussianState:
    """Load + re-pose a gaussian asset (gaussian_4d.py:177-306)."""
    state = read_gaussian_ply(path, max_sh_degree=max_sh_degree)
    rot = asset_transform_matrix(rot_x_degree, rot_z_degree)

    xyz = (rot @ np.asarray(state.xyz).T).T * scale_factor
    scaling = np.log(np.exp(np.asarray(state.scaling)) * scale_factor)
    # rotate per-gaussian orientations by the same world rotation
    rmats = quat_to_matrix_np(np.asarray(state.rotation, np.float64))
    rotation = matrix_to_quat_np(rot[None] @ rmats)

    return GaussianState(
        xyz=xyz.astype(np.float32),
        features_dc=state.features_dc,
        features_rest=state.features_rest,
        opacity=state.opacity,
        scaling=scaling.astype(np.float32),
        rotation=rotation.astype(np.float32),
        sh_degree=max_sh_degree,
    )
