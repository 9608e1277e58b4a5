"""Standing synthetic evaluation suite (VERDICT r2 item 7).

The reference's 12 evaluation scenes (real landmark meshes) are not available
in this environment, so quality can only be tracked as a TREND: this module
deterministically generates a 10-scene synthetic suite of composed textured
primitives (houses/towers/arches over a ground slab), then runs the full
scene-exploration tester on it (perfect-depth + carving-field bypasses, fixed
seeds) and writes `RESULTS_synthetic.json` in the published results format
(testers/scene.py; reference results/scene_exploration/
test_results_in_default_scenes.json). Round-over-round coverage/AUC on this
suite is the repo's quality regression signal.

Usage:
  python data_tools/synthetic_suite.py generate [root]
  python data_tools/synthetic_suite.py eval [root] [--poses N] [--scenes K]
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from macarons_tpu.data.mesh_io import Mesh, save_obj  # noqa: E402

N_SCENES = 10


# ---------------------------------------------------------------------------
# Primitive builders (triangle soup with per-vertex colors)
# ---------------------------------------------------------------------------


def _box(center, size, color):
    c = np.asarray(center, np.float32)
    s = np.asarray(size, np.float32) / 2
    corners = np.array(
        [[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)],
        np.float32)
    verts = c + corners * s
    faces = np.array([
        [0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5],  # x faces
        [0, 4, 5], [0, 5, 1], [2, 3, 7], [2, 7, 6],  # y faces
        [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3],  # z faces
    ], np.int32)
    colors = np.broadcast_to(np.asarray(color, np.float32), (8, 3)).copy()
    return verts, faces, colors


def _cylinder(center, radius, height, color, n=14):
    c = np.asarray(center, np.float32)
    ang = np.linspace(0, 2 * np.pi, n, endpoint=False)
    ring = np.stack([radius * np.cos(ang), np.zeros(n), radius * np.sin(ang)],
                    -1).astype(np.float32)
    bot = c + ring + [0, -height / 2, 0]
    top = c + ring + [0, height / 2, 0]
    verts = np.concatenate([bot, top,
                            [c + [0, -height / 2, 0], c + [0, height / 2, 0]]])
    faces = []
    for i in range(n):
        j = (i + 1) % n
        faces += [[i, n + i, n + j], [i, n + j, j],
                  [2 * n, j, i], [2 * n + 1, n + i, n + j]]
    colors = np.broadcast_to(np.asarray(color, np.float32),
                             (len(verts), 3)).copy()
    return verts, np.asarray(faces, np.int32), colors


def _pyramid(center, size, height, color):
    c = np.asarray(center, np.float32)
    s = size / 2
    verts = np.array([c + [-s, 0, -s], c + [s, 0, -s], c + [s, 0, s],
                      c + [-s, 0, s], c + [0, height, 0]], np.float32)
    faces = np.array([[0, 2, 1], [0, 3, 2], [0, 1, 4], [1, 2, 4],
                      [2, 3, 4], [3, 0, 4]], np.int32)
    colors = np.broadcast_to(np.asarray(color, np.float32), (5, 3)).copy()
    return verts, faces, colors


def build_scene_mesh(seed: int) -> Mesh:
    """A deterministic 'town block': ground slab + 6-10 varied structures."""
    rs = np.random.default_rng(seed)
    parts = [_box([0, -0.15, 0], [10.0, 0.3, 10.0], [0.45, 0.5, 0.4])]
    n_structs = 6 + int(rs.integers(0, 5))
    for _ in range(n_structs):
        kind = rs.integers(0, 3)
        x, z = rs.uniform(-3.6, 3.6, 2)
        col = rs.uniform(0.2, 0.95, 3)
        if kind == 0:  # house: box + pyramid roof
            w, d = rs.uniform(0.8, 1.8, 2)
            h = rs.uniform(0.8, 2.6)
            parts.append(_box([x, h / 2, z], [w, h, d], col))
            parts.append(_pyramid([x, h, z], max(w, d) * 1.1,
                                  rs.uniform(0.4, 1.0), col * 0.7))
        elif kind == 1:  # tower
            r = rs.uniform(0.3, 0.7)
            h = rs.uniform(1.5, 3.5)
            parts.append(_cylinder([x, h / 2, z], r, h, col))
        else:  # arch: two pillars + lintel
            w = rs.uniform(0.8, 1.6)
            h = rs.uniform(1.0, 2.2)
            t = rs.uniform(0.25, 0.45)
            parts.append(_box([x - w / 2, h / 2, z], [t, h, t], col))
            parts.append(_box([x + w / 2, h / 2, z], [t, h, t], col))
            parts.append(_box([x, h + t / 2, z], [w + t, t, t], col * 0.8))
    verts, faces, colors, off = [], [], [], 0
    for v, f, c in parts:
        verts.append(v)
        faces.append(f + off)
        colors.append(c)
        off += len(v)
    return Mesh(np.concatenate(verts), np.concatenate(faces),
                np.concatenate(colors))


def generate_suite(root: str, n_scenes: int = N_SCENES):
    """Write the deterministic scene directories (obj + settings.json)."""
    os.makedirs(root, exist_ok=True)
    for i in range(n_scenes):
        name = f"synth_{i:02d}"
        d = os.path.join(root, name)
        os.makedirs(d, exist_ok=True)
        mesh = build_scene_mesh(1000 + i)
        save_obj(os.path.join(d, "mesh.obj"), mesh)
        mn = mesh.verts.min(0)
        mx = mesh.verts.max(0)
        settings = {
            "scene": {"x_min": (mn - 0.3).tolist(),
                      "x_max": (mx + 0.3).tolist(),
                      "grid_l": 4, "grid_w": 3, "grid_h": 4},
            "camera": {"x_min": [-6.5, 0.5, -6.5], "x_max": [6.5, 6.5, 6.5],
                       "pose_l": 5, "pose_w": 4, "pose_h": 5,
                       "pose_n_elev": 5, "pose_n_azim": 8,
                       # fixed start poses => deterministic trajectories.
                       # 5 starts (the reference protocol's count,
                       # configs/test/test_in_default_scenes_config.json);
                       # corner/top positions sit outside the structure zone.
                       "start_positions": [[0, 2, 0, 1, 0], [4, 1, 4, 1, 4],
                                           [2, 3, 2, 1, 2], [0, 1, 4, 1, 6],
                                           [4, 2, 0, 2, 3]]},
            "contrast_factor": 1.0,
        }
        with open(os.path.join(d, "settings.json"), "w") as f:
            json.dump(settings, f)
    return root


def eval_params(root: str, n_proxy: int = 20000) -> dict:
    """Tester params for the suite: perfect depth + carving field (the
    decoupling fixtures) so quality reflects the SYSTEM — mapping, carving,
    camera logic, NBV scoring — with fixed-seed weights."""
    return dict(
        data_path=root, image_height=64, image_width=96, znear=0.5, zfar=40.0,
        n_depth=8, n_alpha=2, n_alpha_for_supervision=2, alphas=[-2, -1],
        n_interpolation_steps=2, n_proxy_points=n_proxy, seq_len=512,
        n_gt_surface_points=8192, surface_cell_resolution=0.15,
        test_resolution=0.075, view_state_n_elev=7, view_state_n_azim=14,
        harmonic_degree=8, k_for_knn=8, n_cell_per_occ_forward_pass=8,
        occ_cell_batch=2, min_occ_for_proxy_points=0.1,
        use_occ_to_sample_proxy_points=True, use_sigmoid=True,
        sensor_range=48.0, gathering_factor=0.1, learning_rate=1e-4,
        scene_scale_factor=1.0, random_seed=42, torch_seed=5,
        use_perfect_depth=True, use_supervision_occ=True,
        data_augmentation=False, load_obj_textures=False,
    )


def _traj_summary(results: dict, n_poses: int) -> dict:
    """Mean final coverage + AUC in the BASELINE.md sense."""
    finals, aucs = [], []
    for scene, starts in results.items():
        for s, traj in starts.items():
            cov = traj["coverage"]
            finals.append(cov[-1])
            aucs.append(float(np.mean(cov)))
    return {"mean_final_coverage": float(np.mean(finals)),
            "mean_auc": float(np.mean(aucs)),
            "n_scenes": len(results), "n_poses": n_poses}


def run_suite_eval(root: str, out_json: str = "RESULTS_synthetic.json",
                   n_poses: int = 30, n_start_poses: int = 2,
                   max_scenes=None, policies=("nbv",), verbose: bool = True):
    """Evaluate one or more policies on IDENTICAL scenes/seeds and write one
    combined results file. The "random" / "carving" baselines exist to turn
    the quality trend into a measured LIFT: the learned NBV policy must beat
    a random-valid-neighbor walk and a pure carving heuristic on the same
    suite (the reference's published trajectories in results/
    scene_exploration/ serve this demonstrative purpose)."""
    from macarons_tpu.config import Params
    from macarons_tpu.testers.scene import run_test

    out_dir = os.path.dirname(out_json) or "."
    per_policy, summaries = {}, {}
    for policy in policies:
        params = Params(eval_params(root))
        results = run_test(
            params, data_path=root, results_dir=out_dir,
            results_name=f"_tmp_{policy}_{os.path.basename(out_json)}",
            n_start_poses=n_start_poses, n_poses=n_poses,
            max_scenes=max_scenes, policy=policy, verbose=verbose,
            memory_root=os.path.join(root, f"_eval_memory_{policy}"))
        per_policy[policy] = results
        summaries[policy] = _traj_summary(results, n_poses)
        os.remove(os.path.join(
            out_dir, f"_tmp_{policy}_{os.path.basename(out_json)}"))
        if verbose:
            print(f"policy {policy}:", json.dumps(summaries[policy]))

    # Published-format trajectories for the PRIMARY policy (nbv) at the top
    # level (keeps the file shape of previous rounds); baselines + lift below.
    primary = "nbv" if "nbv" in per_policy else list(per_policy)[0]
    data = dict(per_policy[primary])
    data["_summary"] = summaries[primary]
    if len(per_policy) > 1:
        data["_baselines"] = {p: per_policy[p] for p in per_policy
                              if p != primary}
        data["_baseline_summaries"] = {p: s for p, s in summaries.items()
                                       if p != primary}
        lift = {}
        for p, s in summaries.items():
            if p == primary:
                continue
            lift[f"auc_vs_{p}_pct"] = round(
                100.0 * (summaries[primary]["mean_auc"] / s["mean_auc"] - 1),
                2)
            lift[f"final_vs_{p}_pct"] = round(
                100.0 * (summaries[primary]["mean_final_coverage"]
                         / s["mean_final_coverage"] - 1), 2)
        data["_lift"] = lift
        if verbose:
            print("lift:", json.dumps(lift))
    data["_protocol"] = {"n_poses": n_poses, "n_start_poses": n_start_poses,
                         "policies": list(per_policy)}
    with open(out_json, "w") as f:
        json.dump(data, f, indent=1)
    if verbose:
        print("synthetic suite summary:", json.dumps(summaries[primary]))
    return summaries


if __name__ == "__main__":
    from macarons_tpu.utils.platform import configure_platform

    # Default CPU: the quality trend must be cross-round comparable, and the
    # shared-pool TPU sessions vary >100x (ROADMAP). MACARONS_PLATFORM
    # overrides (the sitecustomize's jax.config force wins over JAX_PLATFORMS,
    # so the env var alone is not enough).
    os.environ.setdefault("MACARONS_PLATFORM", "cpu")
    configure_platform()
    cmd = sys.argv[1] if len(sys.argv) > 1 else "generate"
    root = sys.argv[2] if len(sys.argv) > 2 else "data/synthetic_scenes"
    if cmd == "generate":
        generate_suite(root)
        print(f"wrote {N_SCENES} scenes under {root}")
    elif cmd in ("eval", "eval-all"):
        poses = 30
        scenes = None
        starts = 2
        out = "RESULTS_synthetic.json"
        policies = ("nbv",) if cmd == "eval" else ("nbv", "random", "carving")
        for a in sys.argv[3:]:
            if a.startswith("--poses"):
                poses = int(a.split("=")[1])
            if a.startswith("--scenes"):
                scenes = int(a.split("=")[1])
            if a.startswith("--starts"):
                starts = int(a.split("=")[1])
            if a.startswith("--policies"):
                policies = tuple(a.split("=")[1].split(","))
            if a.startswith("--out"):
                out = a.split("=")[1]
        if not os.path.isdir(root) or not os.listdir(root):
            generate_suite(root)
        run_suite_eval(root, out_json=out, n_poses=poses,
                       n_start_poses=starts, max_scenes=scenes,
                       policies=policies)
    else:
        raise SystemExit(f"unknown command {cmd}")
