"""Interactive MACARONS exploration demo — browser UI over the real pipeline.

The reference ships Gradio dashboards (demos/macarons_demo.py:139-595); gradio
is not in this image, so this serves an equivalent interactive UI with the
python stdlib http.server: load a scene + model, then click "NBV step" to run
one real decision phase (depth inference -> mapping -> carving -> occupancy
field -> fused candidate scoring) and camera move; the page shows the captured
RGB, predicted depth, the growing surface cloud, and the coverage curve.

Usage:
  python demos/interactive_demo.py --scene_dir <scene dir> [--weights ckpt]
      [--port 7860]
then open http://localhost:7860
"""

import argparse
import base64
import io
import json
import os
import sys
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

from macarons_tpu.utils.platform import configure_platform

configure_platform()

import jax
import numpy as np
import jax.numpy as jnp

from macarons_tpu.config import Params
from macarons_tpu.data.scenes import SceneDataset
from macarons_tpu.models.macarons import (
    create_macarons_model,
    init_macarons_variables,
    load_macarons,
)
from macarons_tpu.scene import grid as G
from macarons_tpu.scene.memory import Memory
from macarons_tpu.trainers.train_macarons import (
    MacaronsRuntime,
    capture_and_save,
    decision_and_move,
    setup_scene,
)
from macarons_tpu.utils.checkpoint import checkpoint_exists

from macarons_demo import DEFAULTS  # shared tiny-demo parameter set

PAGE = """<!doctype html>
<html><head><title>MACARONS-TPU explorer</title>
<style>
 body { font-family: sans-serif; margin: 2em; background: #161616; color: #eee; }
 img { image-rendering: pixelated; border: 1px solid #444; }
 button { font-size: 1.1em; padding: 0.5em 1.2em; margin-right: 1em; }
 .row { display: flex; gap: 1.5em; margin-top: 1em; flex-wrap: wrap; }
 .card { background: #222; padding: 1em; border-radius: 8px; }
 h3 { margin: 0 0 .5em 0; font-weight: normal; color: #9cf; }
</style></head>
<body>
<h2>MACARONS-TPU — interactive NBV exploration</h2>
<div>
 <button onclick="step()">NBV step</button>
 <button onclick="reset()">Reset</button>
 <span id="status"></span>
</div>
<div class="row">
 <div class="card"><h3>Captured RGB</h3><img id="rgb" width="336"></div>
 <div class="card"><h3>Predicted depth</h3><img id="depth" width="336"></div>
 <div class="card"><h3>Surface cloud (top view)</h3><img id="cloud" width="336"></div>
 <div class="card"><h3>Coverage</h3><img id="cov" width="336"></div>
</div>
<script>
async function call(p) {
  document.getElementById('status').textContent = ' running...';
  const r = await fetch(p, {method: 'POST'});
  const d = await r.json();
  for (const k of ['rgb', 'depth', 'cloud', 'cov'])
    if (d[k]) document.getElementById(k).src = 'data:image/png;base64,' + d[k];
  document.getElementById('status').textContent =
    ` pose ${d.pose}: coverage ${d.coverage.toFixed(4)}`;
}
function step() { call('/step'); }
function reset() { call('/reset'); }
</script>
</body></html>
"""


def array_png(a):
    """uint8-able (H, W[, 3]) array -> base64 PNG."""
    from PIL import Image

    a = np.asarray(a)
    if a.dtype != np.uint8:
        a = np.clip(a, 0.0, 1.0)
        a = (a * 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(a).save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode()


def plot_png(draw_fn):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(4, 3), dpi=90)
    draw_fn(ax)
    buf = io.BytesIO()
    fig.tight_layout()
    fig.savefig(buf, format="png")
    plt.close(fig)
    return base64.b64encode(buf.getvalue()).decode()


class DemoSession:
    """Server-side exploration state; every /step runs one REAL decision."""

    def __init__(self, params: Params, scene_item, memory_root: str,
                 model, variables):
        self.params = params
        self.item = scene_item
        self.memory_root = memory_root
        self.model_bundle = model
        self.variables = variables
        self.lock = threading.Lock()
        self.reset()

    def reset(self):
        params = self.params
        self.key = jax.random.PRNGKey(params.get("torch_seed", 5))
        rs = np.random.default_rng(params.get("random_seed", 42))
        self.key, k = jax.random.split(self.key)
        self.scene = setup_scene(params, self.item, k)
        self.rt = MacaronsRuntime(params, self.model_bundle,
                                  self.scene.cfg, self.scene.cell_table)
        self.memory_path = os.path.join(self.memory_root, "demo_memory")
        self.memory = Memory([self.memory_path])
        cam = self.scene.camera
        cam.initialize(cam.get_random_valid_pose(
            rs, jnp.asarray(self.scene.mesh.verts),
            proxy_points=self.scene.proxy.points))
        for _ in range(1 + self.rt.dcfg.n_alpha):
            capture_and_save(self.scene, self.memory, self.memory_path)
        self.coverages = []
        self.pose = 0
        self.last_rgb = None
        self.last_depth = None

    @property
    def model_bundle(self):
        return self._model

    @model_bundle.setter
    def model_bundle(self, m):
        self._model = m

    def step(self):
        _, batch, alpha, _, self.key = decision_and_move(
            self.rt, self.scene, self.memory, self.memory_path,
            self.variables, self.key)
        self.key, k = jax.random.split(self.key)
        _, depth, mask, err, _, _, _ = self.rt.apply_depth_inference(
            self.variables.depth, batch, alpha, k)
        self.last_rgb = np.asarray(batch["images"][-1])
        self.last_depth = np.asarray(depth[-1, ..., 0])
        cov, _ = G.scene_coverage(self.scene.cfg, self.scene.gt_scene,
                                  self.scene.surface_scene)
        self.coverages.append(float(cov))
        self.pose += 1

    def render(self):
        out = {"pose": self.pose,
               "coverage": self.coverages[-1] if self.coverages else 0.0}
        if self.last_rgb is not None:
            out["rgb"] = array_png(self.last_rgb)
            d = self.last_depth
            lo, hi = float(d.min()), float(max(d.max(), d.min() + 1e-6))
            out["depth"] = array_png((d - lo) / (hi - lo))
        pts, valid = G.all_points(self.scene.surface_scene)
        pts = np.asarray(pts)[np.asarray(valid)]

        def draw_cloud(ax):
            if len(pts):
                ax.scatter(pts[:, 0], pts[:, 2], s=0.5, c=pts[:, 1],
                           cmap="viridis")
            ax.set_aspect("equal")
            ax.set_title(f"{len(pts)} surface points", fontsize=9)

        def draw_cov(ax):
            ax.plot(self.coverages, marker="o", ms=3)
            ax.set_xlabel("pose")
            ax.set_ylabel("coverage")
            ax.set_ylim(0, 1)

        out["cloud"] = plot_png(draw_cloud)
        out["cov"] = plot_png(draw_cov)
        return out


def make_handler(session: DemoSession):
    class Handler(BaseHTTPRequestHandler):
        def _json(self, obj, code=200):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            body = PAGE.encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/html")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_POST(self):
            with session.lock:
                if self.path == "/reset":
                    session.reset()
                elif self.path == "/step":
                    session.step()
                self._json(session.render())

        def log_message(self, *a):
            pass

    return Handler


def build_session(args) -> DemoSession:
    params = Params(dict(DEFAULTS))
    if args.config:
        from macarons_tpu.config import load_params

        params.update(load_params(args.config).to_dict())
    data_path = os.path.dirname(os.path.abspath(args.scene_dir))
    name = os.path.basename(os.path.abspath(args.scene_dir))
    dataset = SceneDataset(data_path, scene_names=[name])
    item = dataset[0]

    model = create_macarons_model(params)
    key = jax.random.PRNGKey(0)
    variables = init_macarons_variables(params, model, key)
    if args.weights and checkpoint_exists(args.weights):
        variables, _ = load_macarons(args.weights, variables)

    return DemoSession(params, item, args.out, model, variables)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene_dir", required=True)
    ap.add_argument("--config", default=None)
    ap.add_argument("--weights", default=None)
    ap.add_argument("--out", default="demo_out")
    ap.add_argument("--port", type=int, default=7860)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    session = build_session(args)
    server = ThreadingHTTPServer(("0.0.0.0", args.port),
                                 make_handler(session))
    print(f"serving on http://localhost:{args.port}")
    server.serve_forever()


if __name__ == "__main__":
    main()
