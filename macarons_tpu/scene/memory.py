"""On-disk experience replay store (host-side IO).

Rebuilds the reference Memory (macarons_utils.py:3091-3457): per-scene
directories `<scene>/macarons_memory/training/<traj>/` holding captured frames,
predicted depths, and surface/occupancy scene snapshots. The on-disk layout is
the self-supervision contract (frames are re-read for depth replay); files are
.npz with the reference's dict keys. Device pipelines never block on this —
reads/writes happen between jit steps on host.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np

from .grid import GridState
from .proxy import ProxyState


class Memory:
    """Replay store over one or more scene directories (reference :3091-3160).

    Writes are ASYNCHRONOUS: device arrays start a non-blocking d2h copy
    (`copy_to_host_async`) and a writer thread serializes the .npz, so the
    dispatch pipeline never stalls on frame persistence (the reference blocks
    on a torch.save per captured frame, macarons_utils.py:2317-2335). Reads
    barrier on any in-flight write of the same file."""

    def __init__(self, scene_memory_paths: List[str], current_epoch: int = 0,
                 n_trajectories: int = 1):
        self.scene_memory_paths = list(scene_memory_paths)
        self.n_trajectories = n_trajectories
        self.current_epoch = current_epoch
        self._inflight: Dict[str, object] = {}  # file path -> Future
        for path in self.scene_memory_paths:
            for traj in range(n_trajectories):
                for sub in ("frames", "depths", "surface", "occupancy", "poses"):
                    os.makedirs(os.path.join(path, "training", str(traj), sub),
                                exist_ok=True)

    def current_trajectory(self) -> int:
        return self.current_epoch % self.n_trajectories

    # -- async write machinery ----------------------------------------------
    _writer_pool = None

    @classmethod
    def _writer(cls):
        if cls._writer_pool is None:
            from concurrent.futures import ThreadPoolExecutor

            cls._writer_pool = ThreadPoolExecutor(
                max_workers=2, thread_name_prefix="memory-writer")
        return cls._writer_pool

    def _save_npz_async(self, fpath: str, arrays: Dict):
        """Queue an .npz write: d2h copies start now (non-blocking), the
        blocking np.asarray + serialization happen on the writer thread."""
        import jax

        with jax.transfer_guard_device_to_host("allow"):  # intentional, async
            for v in arrays.values():
                start = getattr(v, "copy_to_host_async", None)
                if start is not None:
                    start()

        def write():
            np.savez(fpath, **{k: np.asarray(v) for k, v in arrays.items()})

        self._wait_for(fpath)  # never two in-flight writes of one file
        self._inflight[fpath] = self._writer().submit(write)

    def _wait_for(self, fpath: str):
        fut = self._inflight.pop(fpath, None)
        if fut is not None:
            fut.result()

    def flush(self):
        """Barrier on every queued write (call before directory listings)."""
        for fpath in list(self._inflight):
            self._wait_for(fpath)

    # -- frames -------------------------------------------------------------
    def frames_dir(self, scene_path: str, traj: Optional[int] = None) -> str:
        t = self.current_trajectory() if traj is None else traj
        return os.path.join(scene_path, "training", str(t), "frames")

    def save_frame(self, scene_path: str, frame_nb: int, rgb, zbuf, mask, R, T,
                   zfar, traj: Optional[int] = None):
        """Frame schema matches the reference's saved dict (macarons_utils.py:2322-2333)."""
        self._save_npz_async(
            os.path.join(self.frames_dir(scene_path, traj), f"{frame_nb}.npz"),
            dict(rgb=rgb, zbuf=zbuf, mask=mask, R=R, T=T,
                 zfar=np.float32(zfar)),
        )

    def save_frame_batch(self, scene_path: str, first_frame_nb: int, rgb, zbuf,
                         mask, R, T, zfar, traj: Optional[int] = None):
        """Persist a whole capture batch (K frames) as K per-frame .npz files
        with ZERO device work: one async d2h copy per batch array, all slicing
        on the writer thread (the per-frame path issued 3 device-slice launches
        per frame)."""
        import jax

        arrays = dict(rgb=rgb, zbuf=zbuf, mask=mask, R=R, T=T)
        with jax.transfer_guard_device_to_host("allow"):  # intentional, async
            for v in arrays.values():
                start = getattr(v, "copy_to_host_async", None)
                if start is not None:
                    start()

        d = self.frames_dir(scene_path, traj)
        K = rgb.shape[0]
        fpaths = [os.path.join(d, f"{first_frame_nb + i}.npz")
                  for i in range(K)]
        for f in fpaths:
            self._wait_for(f)

        def write():
            host = {k: np.asarray(v) for k, v in arrays.items()}
            for i, f in enumerate(fpaths):
                np.savez(f, rgb=host["rgb"][i : i + 1],
                         zbuf=host["zbuf"][i : i + 1],
                         mask=host["mask"][i : i + 1], R=host["R"][i : i + 1],
                         T=host["T"][i : i + 1], zfar=np.float32(zfar))

        fut = self._writer().submit(write)
        for f in fpaths:
            self._inflight[f] = fut

    def load_frame(self, scene_path: str, frame_nb: int,
                   traj: Optional[int] = None) -> Dict[str, np.ndarray]:
        f = os.path.join(self.frames_dir(scene_path, traj), f"{frame_nb}.npz")
        self._wait_for(f)
        return dict(np.load(f))

    def n_frames(self, scene_path: str, traj: Optional[int] = None) -> int:
        self.flush()
        d = self.frames_dir(scene_path, traj)
        return len([f for f in os.listdir(d) if f.endswith(".npz")])

    _loader = None

    @classmethod
    def _async_loader(cls):
        if cls._loader is None:
            from ..utils.native_loader import AsyncLoader

            cls._loader = AsyncLoader(n_threads=4)
        return cls._loader

    def load_frame_sequence(self, scene_path: str, last_frame_nb: int, n: int,
                            traj: Optional[int] = None):
        """Stack frames [last-n+1 .. last] (reference load_images_for_depth_model
        :763-803). Returns dict of stacked arrays.

        All n files are prefetched concurrently through the native async loader
        (IO overlaps and parallelizes instead of the reference's serial reads).
        """
        from ..utils.native_loader import prefetch_npz, take_npz

        loader = self._async_loader()
        d = self.frames_dir(scene_path, traj)
        paths = [os.path.join(d, f"{last_frame_nb - n + 1 + i}.npz")
                 for i in range(n)]
        for p in paths:
            self._wait_for(p)
        jobs = prefetch_npz(loader, paths)
        frames = [take_npz(loader, j) for j in jobs]
        return {
            "images": np.concatenate([f["rgb"] for f in frames], axis=0),
            "zbuf": np.concatenate([f["zbuf"] for f in frames], axis=0),
            "mask": np.concatenate([f["mask"] for f in frames], axis=0),
            "R": np.concatenate([f["R"] for f in frames], axis=0),
            "T": np.concatenate([f["T"] for f in frames], axis=0),
            "zfar": np.full((n,), float(frames[0]["zfar"]), np.float32),
        }

    # -- depths (predicted, for SCONE replay) --------------------------------
    def save_depth(self, scene_path: str, frame_nb: int, depth, mask, error_mask,
                   R, T, traj: Optional[int] = None):
        t = self.current_trajectory() if traj is None else traj
        self._save_npz_async(
            os.path.join(scene_path, "training", str(t), "depths",
                         f"{frame_nb}.npz"),
            dict(depth=depth, mask=mask, error_mask=error_mask, R=R, T=T),
        )

    def load_depth(self, scene_path: str, frame_nb: int,
                   traj: Optional[int] = None):
        t = self.current_trajectory() if traj is None else traj
        f = os.path.join(scene_path, "training", str(t), "depths",
                         f"{frame_nb}.npz")
        self._wait_for(f)
        return dict(np.load(f))

    def n_depths(self, scene_path: str, traj: Optional[int] = None) -> int:
        self.flush()
        t = self.current_trajectory() if traj is None else traj
        d = os.path.join(scene_path, "training", str(t), "depths")
        return len([f for f in os.listdir(d) if f.endswith(".npz")])

    # -- scene snapshots ------------------------------------------------------
    def save_surface_scene(self, scene_path: str, state: GridState,
                           traj: Optional[int] = None, **scene_params):
        t = self.current_trajectory() if traj is None else traj
        self._save_npz_async(
            os.path.join(scene_path, "training", str(t), "surface",
                         "scene.npz"),
            dict(points=state.points, features=state.features,
                 valid=state.valid, **scene_params),
        )

    def load_surface_scene(self, scene_path: str, traj: Optional[int] = None):
        t = self.current_trajectory() if traj is None else traj
        f = os.path.join(scene_path, "training", str(t), "surface", "scene.npz")
        self._wait_for(f)
        d = dict(np.load(f))
        state = GridState(d.pop("points"), d.pop("features"), d.pop("valid"))
        return state, d

    def save_occupancy_field(self, scene_path: str, state: ProxyState,
                             traj: Optional[int] = None, **scene_params):
        t = self.current_trajectory() if traj is None else traj
        self._save_npz_async(
            os.path.join(scene_path, "training", str(t), "occupancy",
                         "field.npz"),
            dict(**state._asdict(), **scene_params),
        )

    def load_occupancy_field(self, scene_path: str, traj: Optional[int] = None):
        t = self.current_trajectory() if traj is None else traj
        f = os.path.join(scene_path, "training", str(t), "occupancy",
                         "field.npz")
        self._wait_for(f)
        d = dict(np.load(f))
        fields = {k: d.pop(k) for k in list(ProxyState._fields)}
        return ProxyState(**fields), d

    def save_poses(self, scene_path: str, epoch: int, X_history, V_history,
                   idx_history, traj: Optional[int] = None):
        t = self.current_trajectory() if traj is None else traj
        self._save_npz_async(
            os.path.join(scene_path, "training", str(t), "poses",
                         f"epoch_{epoch}.npz"),
            dict(X_cam=np.asarray(X_history), V_cam=np.asarray(V_history),
                 cam_idx=np.asarray(idx_history)),
        )

    # -- replay sampling ------------------------------------------------------
    def get_random_frames_for_depth(self, rs: np.random.Generator,
                                    scene_path: str, n_needed: int,
                                    exclude_traj: Optional[int] = None):
        """Random past frame burst from any trajectory except the in-progress one
        (the reference's 'APOCALYPSE' guard, macarons_utils.py:3272-3282).

        Returns (traj, last_frame_nb) or None if nothing is replayable."""
        candidates = []
        for t in range(self.n_trajectories):
            if exclude_traj is not None and t == exclude_traj:
                continue
            n = self.n_frames(scene_path, t)
            if n >= n_needed:
                candidates.append((t, n))
        if not candidates:
            return None
        t, n = candidates[rs.integers(0, len(candidates))]
        last = int(rs.integers(n_needed - 1, n))
        return t, last

    def sample_depth_replay(self, rs: np.random.Generator, n_samples: int,
                            n_context: int,
                            exclude_traj: Optional[int] = None):
        """Sample n_samples independent (scene_path, traj, last_frame) tuples
        across ALL scene memories and past trajectories (reference
        get_random_batch_for_depth_model, macarons_utils.py:3248-3322: each
        sample is ONE random supervision frame + its alpha context, drawn from
        a random scene and any trajectory except the in-progress index).

        Returns a list of tuples, or None if no trajectory is replayable."""
        pools = []
        for path in self.scene_memory_paths:
            for t in range(self.n_trajectories):
                if exclude_traj is not None and t == exclude_traj:
                    continue
                n = self.n_frames(path, t)
                if n >= n_context:
                    pools.append((path, t, n))
        if not pools:
            return None
        out = []
        for _ in range(n_samples):
            path, t, n = pools[rs.integers(0, len(pools))]
            out.append((path, t, int(rs.integers(n_context - 1, n))))
        return out

    def get_random_scene_for_scone(self, rs: np.random.Generator,
                                   scene_path: str, n_supervise: int,
                                   n_loops: int = 1, max_build: int = 30,
                                   exclude_traj: Optional[int] = None,
                                   n_proxy_points: Optional[int] = None):
        """Pick a replay trajectory + load its saved end-of-trajectory
        snapshots (reference get_random_scene_for_scone_model :3324-3457):
        a random-length consecutive BUILD sub-trajectory of 1..max_build-1
        depths rebuilds the partial world; the caller then runs `n_loops`
        supervision windows of n_supervise depths each (first window depth =
        last build depth, windows advancing by n_supervise-1).

        The saved occupancy snapshot supplies the replay's occupancy-loss
        pseudo-GT — `(supervision_occ > 0) & (out_of_field < 1)` over the FULL
        trajectory's carving (reference save_occupancy_field_in_memory
        :631-632) — and the carving counters the replay continues from
        (load_occupancy_field_from_memory :689-694). Proxy layouts are
        name-seeded with a stable digest, so the snapshot's per-point arrays
        align with the live scene's layout; a snapshot with a different proxy
        count is skipped.

        Returns (traj, build_frames, info) or None, with info containing
        'pseudo_gt' (N, 1), 'n_inside_fov' (N, 1), 'n_behind_depth' (N, 1)
        (all float32 numpy) and 'n_depths' (int)."""
        self.flush()
        need_extra = n_loops * max(n_supervise - 1, 0)
        candidates = []
        for t in range(self.n_trajectories):
            if exclude_traj is not None and t == exclude_traj:
                continue
            surf = os.path.join(scene_path, "training", str(t), "surface",
                                "scene.npz")
            occf = os.path.join(scene_path, "training", str(t), "occupancy",
                                "field.npz")
            n_d = self.n_depths(scene_path, t)
            if os.path.exists(surf) and os.path.exists(occf) \
                    and n_d >= 1 + need_extra:
                candidates.append((t, n_d))
        if not candidates:
            return None
        t, n_d = candidates[rs.integers(0, len(candidates))]
        state, _ = self.load_occupancy_field(scene_path, t)
        if n_proxy_points is not None \
                and state.points.shape[0] != n_proxy_points:
            return None  # stale snapshot from another proxy layout
        pseudo_gt = ((np.asarray(state.supervision_occ) > 0.0)
                     & (np.asarray(state.out_of_field) < 1.0)
                     ).astype(np.float32)
        info = {
            "pseudo_gt": pseudo_gt,
            "n_inside_fov": np.asarray(state.n_inside_fov, np.float32),
            "n_behind_depth": np.asarray(state.n_behind_depth, np.float32),
            "n_depths": n_d,
        }
        hi_build = max(min(max_build - 1, n_d - need_extra), 1)
        n_build = int(rs.integers(1, hi_build + 1))
        start = int(rs.integers(0, n_d - n_build - need_extra + 1))
        build = list(range(start, start + n_build))
        return t, build, info
