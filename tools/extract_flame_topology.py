"""Extract FLAME mesh-topology data tables into vhap_tpu/assets/flame_topology.npz.

The FLAME head mesh has fixed topology (5023 vertices, 9976 faces); region
definitions (lip rings, neck bands, eyelids, ...) and the procedural-teeth
connectivity are pure numeric facts about that topology. The reference
implementation (vhap/model/flame.py:206-504,773-938) carries them as inline
literals; we store them as a binary data asset with provenance, consumed by
vhap_tpu.model.masks / vhap_tpu.model.surgery.

Usage:  python tools/extract_flame_topology.py [--reference /root/reference]

This is a one-shot build tool; the resulting npz is committed to the repo.
"""

from __future__ import annotations

import argparse
import ast
from pathlib import Path

import numpy as np


def _literal_int_lists_from_call(call: ast.Call):
    """If `call` is torch.tensor([...literal ints or lists...]), return ndarray."""
    if not (isinstance(call.func, ast.Attribute) and call.func.attr == "tensor"):
        return None
    if not call.args:
        return None
    try:
        val = ast.literal_eval(call.args[0])
    except (ValueError, SyntaxError):
        return None
    return np.asarray(val, dtype=np.int64)


def extract(flame_py: Path) -> dict:
    tree = ast.parse(flame_py.read_text())
    out: dict[str, np.ndarray] = {}

    class Visitor(ast.NodeVisitor):
        def visit_Call(self, node: ast.Call):
            # self.v.register_buffer("name", torch.tensor([...]))
            if (isinstance(node.func, ast.Attribute)
                    and node.func.attr == "register_buffer"
                    and len(node.args) == 2
                    and isinstance(node.args[0], ast.Constant)
                    and isinstance(node.args[1], ast.Call)):
                arr = _literal_int_lists_from_call(node.args[1])
                if arr is not None:
                    name = node.args[0].value
                    out.setdefault(f"vmask/{name}", arr)
            self.generic_visit(node)

        def visit_Assign(self, node: ast.Assign):
            # f_teeth_upper = torch.tensor([[...], ...]) and friends
            if (len(node.targets) == 1 and isinstance(node.targets[0], ast.Name)
                    and isinstance(node.value, ast.Call)):
                arr = _literal_int_lists_from_call(node.value)
                if arr is not None and arr.ndim == 2 and arr.shape[1] == 3:
                    out.setdefault(f"faces/{node.targets[0].id}", arr)
            self.generic_visit(node)

    Visitor().visit(tree)

    # teeth left/right half extensions: the two torch.tensor([...]) literals
    # concatenated onto left_half / right_half inside add_teeth().
    for fn in ast.walk(tree):
        if isinstance(fn, ast.FunctionDef) and fn.name == "add_teeth":
            halves = []
            for node in ast.walk(fn):
                if isinstance(node, ast.Call):
                    arr = _literal_int_lists_from_call(node)
                    if arr is not None and arr.ndim == 1 and len(arr) > 50:
                        halves.append(arr)
            assert len(halves) == 2, f"expected 2 half-extension tables, got {len(halves)}"
            out["vmask_teeth_ext/left_half"] = halves[0]
            out["vmask_teeth_ext/right_half"] = halves[1]

    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reference", type=Path, default=Path("/root/reference"))
    ap.add_argument("--out", type=Path,
                    default=Path(__file__).resolve().parents[1] / "vhap_tpu/assets/flame_topology.npz")
    args = ap.parse_args()

    tables = extract(args.reference / "vhap/model/flame.py")
    expected = {"faces/f_teeth_upper", "faces/f_teeth_lower", "faces/f_lip_connect"}
    missing = expected - set(tables)
    assert not missing, f"missing tables: {missing}"

    args.out.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(args.out, **tables)
    print(f"wrote {args.out} with {len(tables)} tables:")
    for k, v in sorted(tables.items()):
        print(f"  {k:45s} {v.shape}")


if __name__ == "__main__":
    main()
