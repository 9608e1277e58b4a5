"""Shipped configs: loadable, reference-schema-compatible, documented deltas only."""

import glob
import json
import os

from macarons_tpu.config import load_params

REPO = os.path.join(os.path.dirname(__file__), "..")
REF = "/root/reference"

# Intentional TPU-side additions (documented in configs/*/README.md)
TPU_ONLY = {
    # _device_management replaces the reference _GPU_management
    "n_devices", "multi_host",
    # _tpu block
    "occ_cell_batch", "n_cell_per_occ_forward_pass",
    "occ_curriculum_min_cells", "occ_curriculum_max_cells",
    "nbv_candidate_bucket", "use_sigmoid", "random_mirror_scenes",
    "surface_cell_resolution", "validate_every_n_epochs", "n_val_poses",
}
# Reference GPU-process fields with no TPU equivalent
REF_ONLY = {"ddp", "jz", "CUDA_VISIBLE_DEVICES", "WORLD_SIZE"}


def test_all_shipped_configs_load():
    paths = glob.glob(os.path.join(REPO, "configs", "**", "*.json"),
                      recursive=True)
    assert len(paths) >= 10
    for p in paths:
        params = load_params(p)
        assert len(params.to_dict()) > 5, p


def _flat(path):
    d = json.load(open(path))
    out = {}
    for k, v in d.items():
        if k.startswith("_") and isinstance(v, dict):
            out.update(v)
        else:
            out[k] = v
    return out


def test_macarons_config_field_parity():
    """Every reference training-config field is present with the same value
    (VERDICT r1 item 6); extras are whitelisted."""
    for name in ("macarons_default_training_config.json",
                 "macarons_default_training_no_pretraining_config_0.json",
                 "macarons_default_training_no_pretraining_config_1.json"):
        ref = _flat(os.path.join(REF, "configs", "macarons", name))
        mine = _flat(os.path.join(REPO, "configs", "macarons", name))
        for k, v in ref.items():
            if k in REF_ONLY:
                continue
            assert k in mine, f"{name}: missing reference field {k}"
            assert mine[k] == v, f"{name}: {k} = {mine[k]} != reference {v}"
        extras = set(mine) - set(ref)
        assert extras <= TPU_ONLY, f"{name}: undocumented extras {extras - TPU_ONLY}"


def test_scone_initialization_configs_match_reference_diff():
    """Initialization configs differ from pretraining exactly as the reference's
    do (epochs + model names)."""
    for sub, base in (("occupancy", "occupancy"),
                      ("coverage_gain", "coverage_gain")):
        pre = _flat(os.path.join(REPO, "configs", "scone", sub,
                                 f"{base}_pretraining_config.json"))
        init = _flat(os.path.join(REPO, "configs", "scone", sub,
                                  f"{base}_initialization_config.json"))
        diff = {k for k in init if init[k] != pre.get(k)}
        allowed = {"epochs", "scone_occ_model_name", "scone_vis_model_name"}
        assert diff <= allowed, diff
        assert init["epochs"] == 1
