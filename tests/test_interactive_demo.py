"""Interactive demo session: one real NBV step headless (no HTTP server)."""

import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "demos"))

import numpy as np

from macarons_tpu.config import Params
from test_train_macarons import TINY, scene_dir  # noqa: F401
import pytest


pytestmark = pytest.mark.slow  # XLA CPU compile dominates; excluded from the smoke tier


def test_demo_session_step(scene_dir, tmp_path):
    import interactive_demo as D
    from macarons_tpu.data.scenes import SceneDataset
    from macarons_tpu.models.macarons import (
        create_macarons_model, init_macarons_variables,
    )
    import jax

    params = Params(dict(TINY, data_path=scene_dir))
    dataset = SceneDataset(scene_dir)
    item = dataset[0]
    model = create_macarons_model(params)
    variables = init_macarons_variables(params, model, jax.random.PRNGKey(0))
    s = D.DemoSession(params, item, str(tmp_path), model, variables)
    s.step()
    s.step()
    out = s.render()
    assert out["pose"] == 2
    assert 0.0 <= out["coverage"] <= 1.0
    for k in ("rgb", "depth", "cloud", "cov"):
        assert isinstance(out[k], str) and len(out[k]) > 100  # base64 PNGs
    s.reset()
    assert s.pose == 0
