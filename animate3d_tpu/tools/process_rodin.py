"""Prepare Rodin-Gen1 OBJ assets: insert ``usemtl Material`` after the
mtllib line and write a template base.mtl pointing at the diffuse texture
(reference tools/mesh_animation/process_rodin_gen1.py:5-30 parity).
"""

from __future__ import annotations

import argparse
import os

MTL_TEMPLATE = """newmtl Material
Ns 250.000000
Ka 1.000000 1.000000 1.000000
Kd 0.800000 0.800000 0.800000
Ks 0.500000 0.500000 0.500000
Ke 0.000000 0.000000 0.000000
Ni 1.450000
d 1.000000
illum 2
map_Kd {texture_name}
"""


def process(obj_path: str, texture_name: str = "texture_diffuse.png") -> None:
    lines = open(obj_path).read().splitlines()
    out = []
    inserted = False
    for line in lines:
        out.append(line)
        if line.startswith("mtllib") and not inserted:
            out.append("usemtl Material")
            inserted = True
    if not inserted:
        out = [f"mtllib base.mtl", "usemtl Material"] + out
    with open(obj_path, "w") as f:
        f.write("\n".join(out) + "\n")
    mtl_path = os.path.join(os.path.dirname(obj_path), "base.mtl")
    with open(mtl_path, "w") as f:
        f.write(MTL_TEMPLATE.format(texture_name=texture_name))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--input_obj", required=True)
    parser.add_argument("--texture_name", default="texture_diffuse.png")
    args = parser.parse_args()
    process(args.input_obj, args.texture_name)
    print(f"processed {args.input_obj}")


if __name__ == "__main__":
    main()
