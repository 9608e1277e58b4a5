"""Synthetic eval suite: deterministic generation + a short eval smoke."""

import sys
import os

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "data_tools"))

import synthetic_suite as S  # noqa: E402
import pytest


pytestmark = pytest.mark.slow  # XLA CPU compile dominates; excluded from the smoke tier


def test_scene_generation_deterministic(tmp_path):
    m1 = S.build_scene_mesh(1003)
    m2 = S.build_scene_mesh(1003)
    np.testing.assert_array_equal(m1.verts, m2.verts)
    np.testing.assert_array_equal(m1.faces, m2.faces)
    m3 = S.build_scene_mesh(1004)
    assert m3.verts.shape != m1.verts.shape or not np.allclose(
        m3.verts[: len(m1.verts)], m1.verts)
    # Valid topology + scene has real volume
    assert m1.faces.max() < len(m1.verts)
    assert (m1.verts.max(0) - m1.verts.min(0)).min() > 0.2


def test_suite_eval_smoke(tmp_path):
    """2 scenes x 1 start x 3 poses through the REAL tester; coverage grows
    and the results JSON has the published format + summary."""
    root = str(tmp_path / "scenes")
    S.generate_suite(root, n_scenes=2)
    out = str(tmp_path / "RESULTS_synthetic.json")
    summaries = S.run_suite_eval(root, out_json=out, n_poses=3,
                                 n_start_poses=1, verbose=False)
    summary = summaries["nbv"]  # one summary per evaluated policy (r5)
    assert summary["n_scenes"] == 2
    assert 0.0 < summary["mean_final_coverage"] <= 1.0
    assert 0.0 < summary["mean_auc"] <= 1.0
    import json

    data = json.load(open(out))
    assert "_summary" in data and "synth_00" in data
    traj = data["synth_00"]["0"]
    assert len(traj["coverage"]) == 4  # initial + 3 poses
    # Exploration makes progress on the synthetic town
    assert traj["coverage"][-1] >= traj["coverage"][0]
