"""Export pipeline: transforms.json schema, flame_param npz, splits, combine."""

import json
from pathlib import Path

import numpy as np
import pytest
import jax.numpy as jnp


@pytest.fixture(scope="module")
def head_small():
    from vhap_tpu.model.flame import FlameHead
    return FlameHead.build(n_shape=20, n_expr=10, add_teeth=True)


@pytest.fixture(scope="module")
def tracked_run(tmp_path_factory, head_small):
    """Fabricate a finished tracking run: synthetic sequence + config.yml +
    tracked_flame_params npz in the reference schema."""
    from vhap_tpu.config.base import BaseTrackingConfig
    from vhap_tpu.config.cli import save_yaml
    from vhap_tpu.tools.make_synthetic_sequence import generate
    from vhap_tpu.tracker import params as P

    root = tmp_path_factory.mktemp("exp")
    seq_dir = root / "data" / "seq"
    gt = generate(seq_dir, n_frames=4, size=128, head=None)

    T = 4
    cfg = BaseTrackingConfig()
    cfg.data.root_folder = root / "data"
    cfg.data.sequence = "seq"
    cfg.data.background_color = None
    cfg.data.use_alpha_map = True
    cfg.model.n_shape, cfg.model.n_expr = 20, 10
    cfg.__post_init__()

    run_dir = root / "track" / "2026-01-01_00-00-00"
    run_dir.mkdir(parents=True)
    save_yaml(cfg, run_dir / "config.yml")

    p = P.init_params(T, 20, 10, 100, head_small.num_verts, 64,
                      True, True, True, True, False, False)
    p["rotation"] = jnp.asarray(np.tile(gt["rotation"][:T, :3], (1, 1)))
    p["translation"] = jnp.asarray(gt["translation"][:T])
    p["expr"] = jnp.asarray(np.pad(gt["expr"][:T, :10], ((0, 0), (0, 0))))
    P.save_result(p, run_dir / "tracked_flame_params_30.npz",
                  timestep_ids=[f"{i:05d}" for i in range(T)],
                  n_processed=T, image_size=(128, 128),
                  calibrated=False, tex_painted=True)
    return root, run_dir, cfg


def test_export_full_pipeline(tracked_run, head_small, tmp_path):
    from vhap_tpu.export_as_nerf_dataset import export

    root, run_dir, cfg = tracked_run
    tgt = root / "export_out"
    export(run_dir.parent, tgt, flame_mode="param",
           create_mask_from_mesh=True, flame_model=head_small)

    # transforms.json structure (vhap/export_as_nerf_dataset.py:88-148)
    db = json.load(open(tgt / "transforms.json"))
    assert set(db) >= {"frames", "timestep_indices", "camera_indices",
                       "cx", "cy", "fl_x", "fl_y", "h", "w"}
    f0 = db["frames"][0]
    for key in ("transform_matrix", "file_path", "fg_mask_path",
                "flame_param_path", "camera_angle_x"):
        assert key in f0, key
    assert (tgt / f0["file_path"]).exists()
    assert (tgt / f0["fg_mask_path"]).exists()

    # per-timestep flame params + canonical (jaw open 0.3)
    fp = np.load(tgt / f0["flame_param_path"])
    assert fp["expr"].shape[0] == 1 and fp["shape"].ndim == 1
    cano = np.load(tgt / "canonical_flame_param.npz")
    np.testing.assert_allclose(cano["jaw_pose"], [[0.3, 0, 0]], atol=1e-6)

    # translation re-centered at origin: mean must be ~0
    all_trans = np.stack([
        np.load(tgt / fr["flame_param_path"])["translation"][0]
        for fr in db["frames"]])
    assert np.abs(all_trans.mean(0)).max() < 1e-5

    # splits: train/val/test jsons exist with 70/30 timesteps
    for div in ("train", "val", "test"):
        assert (tgt / f"transforms_{div}.json").exists()
    tr = json.load(open(tgt / "transforms_train.json"))
    te = json.load(open(tgt / "transforms_test.json"))
    assert len(tr["timestep_indices"]) == 3 and len(te["timestep_indices"]) == 1
    # single camera -> empty val
    va = json.load(open(tgt / "transforms_val.json"))
    assert va["camera_indices"] == []


def test_combine(tracked_run, head_small, tmp_path):
    from vhap_tpu.export_as_nerf_dataset import export
    from vhap_tpu.combine_nerf_datasets import combine

    root, run_dir, cfg = tracked_run
    parent = root / "union"
    parent.mkdir(exist_ok=True)
    for name in ("001_a", "001_b"):
        export(run_dir.parent, parent / name, flame_mode="param",
               create_mask_from_mesh=False, flame_model=head_small)

    combine([parent / "001_a", parent / "001_b"], parent / "UNION_001",
            division_mode="last")

    tr = json.load(open(parent / "UNION_001" / "transforms_train.json"))
    te = json.load(open(parent / "UNION_001" / "transforms_test.json"))
    # 4 + 4 timesteps split into one train + one test sequence
    assert len(tr["timestep_indices"]) == 4
    assert len(te["timestep_indices"]) == 4
    assert te["timestep_indices"] == [4, 5, 6, 7]  # re-offset
    assert tr["frames"][0]["file_path"].startswith("../001_a/")
    assert (parent / "UNION_001" / "canonical_flame_param.npz").exists()
    assert (parent / "UNION_001" / "sequences_trainval.txt").exists()


def test_nerf_dataset_reader(tracked_run, head_small):
    from vhap_tpu.export_as_nerf_dataset import export
    from vhap_tpu.data.nerf_dataset import NeRFDataset

    root, run_dir, cfg = tracked_run
    tgt = root / "reader_out"
    export(run_dir.parent, tgt, flame_mode="param",
           create_mask_from_mesh=False, flame_model=head_small)

    ds = NeRFDataset(tgt, division="train", use_fg_mask=True,
                     use_flame_param=True)
    item = ds[0]
    assert item["image"].shape[-1] == 3
    assert item["intrinsics"].shape == (3, 3)
    assert item["extrinsics"].shape == (4, 4)
    assert "flame_param" in item and "expr" in item["flame_param"]


# ---------------------------------------------------------------------------
# Golden diff vs the ACTUAL reference exporter (VERDICT r3 #7)
# ---------------------------------------------------------------------------

def _assert_json_equal(a, b, path="", rtol=1e-6, atol=1e-8):
    """Recursive semantic compare of two json-loaded trees with float tol."""
    assert type(a) is type(b) or (isinstance(a, (int, float))
                                  and isinstance(b, (int, float))), \
        f"{path}: type {type(a)} != {type(b)}"
    if isinstance(a, dict):
        assert set(a) == set(b), \
            f"{path}: keys differ: {set(a) ^ set(b)}"
        for k in a:
            _assert_json_equal(a[k], b[k], f"{path}.{k}", rtol, atol)
    elif isinstance(a, list):
        assert len(a) == len(b), f"{path}: len {len(a)} != {len(b)}"
        for i, (x, y) in enumerate(zip(a, b)):
            _assert_json_equal(x, y, f"{path}[{i}]", rtol, atol)
    elif isinstance(a, float) or isinstance(b, float):
        np.testing.assert_allclose(a, b, rtol=rtol, atol=atol,
                                   err_msg=path)
    else:
        assert a == b, f"{path}: {a!r} != {b!r}"


def test_export_golden_vs_reference(tracked_run, head_small, tmp_path):
    """Runs the REFERENCE exporter's writers 1 (NeRFDatasetWriter),
    2 (TrackedFLAMEDatasetWriter, param mode) and 4 (split_json) —
    vhap/export_as_nerf_dataset.py:42-349,540-598, torch CPU, absent pip
    deps stubbed — on the same tracked run, then diffs every output
    artifact against vhap_tpu's exporter: transforms*.json field-by-field,
    flame_param/*.npz + canonical_flame_param.npz array-by-array, and the
    image/mask PNGs pixel-by-pixel. MaskFromFLAME (writer 3) needs
    nvdiffrast and is exercised by test_export_full_pipeline on our side
    only."""
    import os
    import sys
    sys.path.insert(0, str(Path(__file__).parent))
    from ref_compat import install_all_stubs, write_ref_asset_tree

    from vhap_tpu.export_as_nerf_dataset import export
    from vhap_tpu.model.assets import load_flame_assets

    root, run_dir, cfg = tracked_run

    # ---- ours ----
    tgt_a = tmp_path / "ours"
    export(run_dir.parent, tgt_a, flame_mode="param",
           create_mask_from_mesh=False, flame_model=head_small)

    # ---- reference ----
    undo = install_all_stubs()
    try:
        import torch
        import vhap.export_as_nerf_dataset as RE
        from vhap.config.base import DataConfig as RefDataConfig
        from vhap.config.base import ModelConfig as RefModelConfig

        # in-process data loading (1-core host; fork workers add nothing)
        class _InlineLoader(torch.utils.data.DataLoader):
            def __init__(self, *a, num_workers=0, **k):
                super().__init__(*a, num_workers=0, **k)

        RE.DataLoader = _InlineLoader

        ref_data = RefDataConfig(
            root_folder=cfg.data.root_folder, sequence=cfg.data.sequence,
            calibrated=False, background_color=None, use_alpha_map=True)
        ref_model = RefModelConfig(n_shape=20, n_expr=10)

        tgt_b = tmp_path / "ref"
        assets = load_flame_assets(allow_synthetic=True, seed=0)
        asset_root = write_ref_asset_tree(tmp_path / "ref_assets", assets)
        cwd = os.getcwd()
        os.chdir(asset_root)  # reference asset paths are relative constants
        try:
            RE.NeRFDatasetWriter(ref_data, tgt_b).write()
            RE.TrackedFLAMEDatasetWriter(ref_model, run_dir, tgt_b,
                                         mode="param").write()
        finally:
            os.chdir(cwd)
        RE.split_json(tgt_b)
    finally:
        undo()

    # ---- diff: every transforms json, semantically ----
    jsons_a = sorted(p.name for p in tgt_a.glob("transforms*.json"))
    jsons_b = sorted(p.name for p in tgt_b.glob("transforms*.json"))
    assert jsons_a == jsons_b, (jsons_a, jsons_b)
    for name in jsons_a:
        _assert_json_equal(json.load(open(tgt_a / name)),
                           json.load(open(tgt_b / name)), path=name)

    # ---- diff: flame params, array-by-array ----
    npz_a = sorted(p.relative_to(tgt_a) for p in tgt_a.rglob("*.npz"))
    npz_b = sorted(p.relative_to(tgt_b) for p in tgt_b.rglob("*.npz"))
    assert npz_a == npz_b and len(npz_a) >= 5, (npz_a, npz_b)
    for rel in npz_a:
        za, zb = dict(np.load(tgt_a / rel)), dict(np.load(tgt_b / rel))
        assert set(za) == set(zb), (rel, set(za) ^ set(zb))
        for k in za:
            np.testing.assert_allclose(
                za[k], zb[k], rtol=1e-6, atol=1e-7, err_msg=f"{rel}:{k}")

    # ---- diff: written images/masks, pixel-by-pixel ----
    from PIL import Image
    png_a = sorted(p.relative_to(tgt_a) for p in tgt_a.rglob("*.png"))
    png_b = sorted(p.relative_to(tgt_b) for p in tgt_b.rglob("*.png"))
    assert png_a == png_b and len(png_a) == 8, (png_a, png_b)
    for rel in png_a:
        ia = np.asarray(Image.open(tgt_a / rel))
        ib = np.asarray(Image.open(tgt_b / rel))
        np.testing.assert_array_equal(ia, ib, err_msg=str(rel))
