"""ShapeNet NBV tester: trajectory properties on synthetic GT."""

import jax
import numpy as np
import pytest

from macarons_tpu.config import Params
from test_pretrain_occ import SMALL
from test_pretrain_vis import VIS_SMALL

pytestmark = pytest.mark.slow  # XLA CPU compile dominates; excluded from the smoke tier


TEST_PARAMS = dict(
    VIS_SMALL, n_view_max=4, pc_size=24, max_points_per_scone_occ_pass=100000,
)


def test_nbv_trajectory_runs_and_coverage_monotone(shapenet_root, tmp_path):  # noqa: F811
    params = Params(dict(TEST_PARAMS, data_path=shapenet_root))
    from macarons_tpu.testers import shapenet as tester

    results = tester.run_test(
        params, data_path=shapenet_root, results_dir=str(tmp_path),
        max_meshes=2, verbose=False,
    )
    mean_cov = np.array(results["mean_coverages"])
    assert mean_cov.shape == (4,)
    # Coverage never decreases as views are added (it's a union)
    assert np.all(np.diff(mean_cov) >= -1e-6)
    assert np.all((mean_cov >= 0) & (mean_cov <= 1))
    # With 4 views of a cube the union should beat the single view
    assert mean_cov[-1] > mean_cov[0]
    # Per-mesh trajectories recorded, results JSON written
    assert len(results["coverages"]) == 2
    import os

    assert os.path.exists(tmp_path / "results_seen.json")


def test_greedy_upper_bound(shapenet_root):  # noqa: F811
    """The learned-model trajectory can't beat the greedy-optimal one by more
    than noise; with random init weights it should be clearly below."""
    from macarons_tpu.data import datasets as D
    from macarons_tpu.trainers.pretrain_vis import greedy_optimal_sequences

    train, _, _ = D.get_shapenet_datasets(shapenet_root)
    _, _, cov = D.get_gt_partial_point_clouds(train.paths[0])
    seq = greedy_optimal_sequences(cov, 4)
    greedy_cov = (cov[seq].sum(axis=0) > 0).mean()
    assert greedy_cov > (cov[seq[:1]].sum(axis=0) > 0).mean()
