"""OBJ mesh → coarse gaussian splat + ARAP connectivity JSON.

Pipeline step 1 of the mesh-animation flow. Behavior parity with the
reference's tools/mesh_animation/mesh2gaussian.py (pytorch3d replaced by
pure NumPy mesh IO):

  * per-vertex colors averaged from the UV texture across incident faces;
  * per-vertex log-scales = log(mean |edge vector| / 1.1) per axis;
  * identity rotations, opacity = inverse_sigmoid(1 - 1e-5);
  * SH degree 0 (f_dc only);
  * mesh-edge connectivity JSON {vertex: {neighbor: distance}} for ARAP.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

from animate3d_tpu.gaussians.state import GaussianState, inverse_sigmoid
from animate3d_tpu.gaussians.ply import write_gaussian_ply
from animate3d_tpu.utils.mesh import (
    load_obj,
    vertex_colors,
    mean_abs_edge_vectors,
    edge_connectivity,
)
from animate3d_tpu.utils.sh import rgb_to_sh


def mesh_to_gaussians(obj_path: str, edge_shrink: float = 1.1) -> GaussianState:
    mesh = load_obj(obj_path)
    colors = vertex_colors(mesh)
    mean_edges = mean_abs_edge_vectors(mesh.verts, mesh.faces) / edge_shrink
    n = mesh.verts.shape[0]

    rotation = np.zeros((n, 4), dtype=np.float32)
    rotation[:, 0] = 1.0
    return GaussianState(
        xyz=mesh.verts.astype(np.float32),
        features_dc=rgb_to_sh(colors.astype(np.float32))[:, None, :],
        features_rest=np.zeros((n, 0, 3), dtype=np.float32),
        opacity=inverse_sigmoid(np.ones((n, 1)) - 1e-5).astype(np.float32),
        scaling=np.log(np.clip(mean_edges, 1e-12, None)).astype(np.float32),
        rotation=rotation,
        sh_degree=0,
    )


def run(input_obj: str, output_dir: str, output_name: str) -> None:
    os.makedirs(output_dir, exist_ok=True)
    state = mesh_to_gaussians(input_obj)
    write_gaussian_ply(os.path.join(output_dir, f"{output_name}.ply"), state)

    mesh = load_obj(input_obj)
    conn = edge_connectivity(mesh.verts, mesh.faces)
    with open(os.path.join(output_dir, f"{output_name}.json"), "w") as f:
        json.dump({str(k): v for k, v in conn.items()}, f, indent=2)


def main() -> None:
    parser = argparse.ArgumentParser(
        description="Convert OBJ to gaussian point cloud + connectivity JSON."
    )
    parser.add_argument("--input_obj", required=True)
    parser.add_argument("--output_dir", required=True)
    parser.add_argument("--output_name", required=True)
    args = parser.parse_args()
    run(args.input_obj, args.output_dir, args.output_name)
    print(f"Wrote {args.output_name}.ply and {args.output_name}.json to {args.output_dir}")


if __name__ == "__main__":
    main()
