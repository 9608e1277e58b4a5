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


# ---------------------------------------------------------------------------
# Device-resident memory (zero-sync training)
# ---------------------------------------------------------------------------


class DepthStore:
    """Device-resident predicted-depth store for SCONE replay (device twin of
    the per-frame depths/<n>.npz files). Fixed-capacity ring with a host-side
    count; appends are device dynamic-update-slices."""

    def __init__(self, max_depths: int, height: int, width: int):
        import jax.numpy as jnp

        self.depth = jnp.zeros((max_depths, height, width, 1), jnp.float32)
        self.mask = jnp.zeros((max_depths, height, width, 1), bool)
        self.error_mask = jnp.zeros((max_depths, height, width, 1), bool)
        self.R = jnp.broadcast_to(jnp.eye(3)[None], (max_depths, 3, 3))
        self.T = jnp.zeros((max_depths, 3), jnp.float32)
        self.n = 0  # host-side count (appends are host-initiated)

    def append(self, depth, mask, error_mask, R, T):
        import jax

        at = self.n
        upd = jax.jit(
            lambda s, v, a: jax.lax.dynamic_update_slice(
                s, v, (a,) + (0,) * (s.ndim - 1)))
        k = depth.shape[0]
        self.depth = upd(self.depth, depth.astype(self.depth.dtype), at)
        self.mask = upd(self.mask, mask.astype(bool), at)
        self.error_mask = upd(self.error_mask, error_mask.astype(bool), at)
        self.R = upd(self.R, R.astype(self.R.dtype), at)
        self.T = upd(self.T, T.astype(self.T.dtype), at)
        self.n = at + k

    def gather(self, indices):
        """Stack entries [i for i in indices] -> dict of device arrays."""
        import jax
        import jax.numpy as jnp

        idx = jnp.asarray(list(indices), jnp.int32)
        take = jax.jit(lambda s, i: jnp.take(s, i, axis=0))
        return {
            "depth": take(self.depth, idx), "mask": take(self.mask, idx),
            "error_mask": take(self.error_mask, idx),
            "R": take(self.R, idx), "T": take(self.T, idx),
        }


class DeviceMemory:
    """Device-resident twin of Memory for zero-sync training.

    Rationale (ROADMAP "CRITICAL runtime facts"): ANY device->host transfer —
    including the async frame writes the disk Memory uses — permanently
    degrades the tunneled TPU runtime to synchronous dispatch (731 ms vs
    2.2 ms per depth train step). So during training, frames / predicted
    depths / scene snapshots / pose histories all stay ON DEVICE: frames in
    per-trajectory FrameStores (replay windows are device slices), snapshots
    as retained array handles. The query/sampling API mirrors Memory
    (reference macarons_utils.py:3091-3457) with counts tracked host-side —
    they are known at append time without device reads. ``flush_to_disk``
    persists everything through the on-disk Memory in one go (the run's only
    d2h), in the exact .npz layout Memory reads back — resume semantics are
    unchanged.

    Capacity = n_trajectories rotating stores per scene, exactly the
    reference's Memory rotation."""

    def __init__(self, scene_memory_paths: List[str], current_epoch: int = 0,
                 n_trajectories: int = 1, max_frames: int = 512,
                 max_depths: int = 128, height: int = 256, width: int = 456,
                 zfar: float = 750.0):
        self.scene_memory_paths = list(scene_memory_paths)
        self.n_trajectories = n_trajectories
        self.current_epoch = current_epoch
        self.max_frames = max_frames
        self.max_depths = max_depths
        self.height, self.width = height, width
        self.zfar = float(zfar)
        self._frames: Dict = {}  # (path, traj) -> FrameStore
        self._n_frames: Dict = {}  # (path, traj) -> int (host mirror)
        self._depths: Dict = {}  # (path, traj) -> DepthStore
        self._surface: Dict = {}  # (path, traj) -> (GridState, params)
        self._occupancy: Dict = {}  # (path, traj) -> (ProxyState, params)
        self._poses: Dict = {}  # (path, traj) -> {epoch: (X, V, idx, n_m, n_f)}

    def current_trajectory(self) -> int:
        return self.current_epoch % self.n_trajectories

    # -- frames ---------------------------------------------------------------
    def begin_trajectory(self, scene_path: str):
        """Fresh frame + depth stores for the current trajectory slot (the
        reference overwrites the rotated trajectory directory)."""
        from .depth_runtime import init_frame_store

        t = self.current_trajectory()
        self._frames[(scene_path, t)] = init_frame_store(
            self.max_frames, self.height, self.width)
        self._n_frames[(scene_path, t)] = 0
        self._depths[(scene_path, t)] = DepthStore(self.max_depths,
                                                   self.height, self.width)
        self._surface.pop((scene_path, t), None)
        self._occupancy.pop((scene_path, t), None)
        return self._frames[(scene_path, t)]

    def store(self, scene_path: str, traj: Optional[int] = None):
        t = self.current_trajectory() if traj is None else traj
        return self._frames[(scene_path, t)]

    def update_store(self, scene_path: str, store, n_added: int):
        """Adopt the store handle returned by a fused capture program and
        advance the host-side frame count."""
        t = self.current_trajectory()
        self._frames[(scene_path, t)] = store
        self._n_frames[(scene_path, t)] += n_added

    def n_frames(self, scene_path: str, traj: Optional[int] = None) -> int:
        t = self.current_trajectory() if traj is None else traj
        return self._n_frames.get((scene_path, t), 0)

    def load_frame_sequence(self, scene_path: str, last_frame_nb: int, n: int,
                            traj: Optional[int] = None) -> Dict:
        """Device twin of Memory.load_frame_sequence: a dynamic window slice
        of the trajectory's FrameStore (keys match: images/zbuf/mask/R/T/zfar;
        'images' are device arrays, not numpy)."""
        from .depth_runtime import store_window

        t = self.current_trajectory() if traj is None else traj
        return store_window(self._frames[(scene_path, t)], last_frame_nb, n,
                            self.zfar)

    # -- depths (predicted, for SCONE replay) ---------------------------------
    def save_depth(self, scene_path: str, frame_nb: int, depth, mask,
                   error_mask, R, T, traj: Optional[int] = None):
        t = self.current_trajectory() if traj is None else traj
        self._depths[(scene_path, t)].append(depth, mask, error_mask, R, T)

    def n_depths(self, scene_path: str, traj: Optional[int] = None) -> int:
        t = self.current_trajectory() if traj is None else traj
        ds = self._depths.get((scene_path, t))
        return 0 if ds is None else ds.n

    def load_depth(self, scene_path: str, frame_nb: int,
                   traj: Optional[int] = None) -> Dict:
        """Device twin of Memory.load_depth: one entry as device slices."""
        t = self.current_trajectory() if traj is None else traj
        ds = self._depths[(scene_path, t)]
        i = int(frame_nb)
        return {
            "depth": ds.depth[i:i + 1], "mask": ds.mask[i:i + 1],
            "error_mask": ds.error_mask[i:i + 1], "R": ds.R[i:i + 1],
            "T": ds.T[i:i + 1],
        }

    def depth_stack(self, scene_path: str, traj: int, indices):
        return self._depths[(scene_path, traj)].gather(indices)

    # -- scene snapshots -------------------------------------------------------
    def save_surface_scene(self, scene_path: str, state: GridState,
                           traj: Optional[int] = None, **scene_params):
        t = self.current_trajectory() if traj is None else traj
        self._surface[(scene_path, t)] = (state, dict(scene_params))

    def load_surface_scene(self, scene_path: str, traj: Optional[int] = None):
        t = self.current_trajectory() if traj is None else traj
        return self._surface[(scene_path, t)]

    def save_occupancy_field(self, scene_path: str, state: ProxyState,
                             traj: Optional[int] = None, **scene_params):
        t = self.current_trajectory() if traj is None else traj
        self._occupancy[(scene_path, t)] = (state, dict(scene_params))

    def load_occupancy_field(self, scene_path: str,
                             traj: Optional[int] = None):
        t = self.current_trajectory() if traj is None else traj
        return self._occupancy[(scene_path, t)]

    def save_poses(self, scene_path: str, epoch: int, X_history, V_history,
                   idx_history, n_moves: int = None, n_frames: int = None,
                   traj: Optional[int] = None):
        t = self.current_trajectory() if traj is None else traj
        self._poses.setdefault((scene_path, t), {})[epoch] = (
            X_history, V_history, idx_history, n_moves, n_frames)

    # -- replay sampling (host logic over host counts) -------------------------
    def get_random_frames_for_depth(self, rs: np.random.Generator,
                                    scene_path: str, n_needed: int,
                                    exclude_traj: Optional[int] = None):
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
        return t, int(rs.integers(n_needed - 1, n))

    def sample_depth_replay(self, rs: np.random.Generator, n_samples: int,
                            n_context: int,
                            exclude_traj: Optional[int] = None):
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
        """Memory.get_random_scene_for_scone with device payloads: the
        pseudo-GT and carving counters come back as DEVICE arrays (no d2h)."""
        import jax.numpy as jnp

        need_extra = n_loops * max(n_supervise - 1, 0)
        candidates = []
        for t in range(self.n_trajectories):
            if exclude_traj is not None and t == exclude_traj:
                continue
            n_d = self.n_depths(scene_path, t)
            if (scene_path, t) in self._surface \
                    and (scene_path, t) in self._occupancy \
                    and n_d >= 1 + need_extra:
                candidates.append((t, n_d))
        if not candidates:
            return None
        t, n_d = candidates[rs.integers(0, len(candidates))]
        state, _ = self._occupancy[(scene_path, t)]
        if n_proxy_points is not None \
                and state.points.shape[0] != n_proxy_points:
            return None
        pseudo_gt = ((state.supervision_occ > 0.0)
                     & (state.out_of_field < 1.0)).astype(jnp.float32)
        info = {
            "pseudo_gt": pseudo_gt,
            "n_inside_fov": jnp.asarray(state.n_inside_fov, jnp.float32),
            "n_behind_depth": jnp.asarray(state.n_behind_depth, jnp.float32),
            "n_depths": n_d,
        }
        hi_build = max(min(max_build - 1, n_d - need_extra), 1)
        n_build = int(rs.integers(1, hi_build + 1))
        start = int(rs.integers(0, n_d - n_build - need_extra + 1))
        build = list(range(start, start + n_build))
        return t, build, info

    # -- persistence -----------------------------------------------------------
    def hydrate_from_disk(self):
        """Re-upload a previous run's persisted memory (resume): frames,
        depths, and snapshots load h2d into device stores — host->device
        transfers do NOT degrade the runtime, so a resumed run still trains
        zero-sync."""
        import jax.numpy as jnp

        from .depth_runtime import init_frame_store, store_append

        mem = Memory(self.scene_memory_paths, self.current_epoch,
                     self.n_trajectories)
        for path in self.scene_memory_paths:
            for t in range(self.n_trajectories):
                n = min(mem.n_frames(path, t), self.max_frames)
                if n:
                    fr = mem.load_frame_sequence(path, n - 1, n, t)
                    store = init_frame_store(self.max_frames, self.height,
                                             self.width)
                    store = store_append(
                        store, jnp.asarray(fr["images"]),
                        jnp.asarray(fr["zbuf"]),
                        jnp.asarray(fr["mask"]).astype(bool),
                        jnp.asarray(fr["R"]), jnp.asarray(fr["T"]))
                    self._frames[(path, t)] = store
                    self._n_frames[(path, t)] = n
                n_d = min(mem.n_depths(path, t), self.max_depths)
                if n_d:
                    ds = DepthStore(self.max_depths, self.height, self.width)
                    for i in range(n_d):
                        d = mem.load_depth(path, i, t)
                        ds.append(jnp.asarray(d["depth"]),
                                  jnp.asarray(d["mask"]),
                                  jnp.asarray(d["error_mask"]),
                                  jnp.asarray(d["R"]), jnp.asarray(d["T"]))
                    self._depths[(path, t)] = ds
                surf = os.path.join(path, "training", str(t), "surface",
                                    "scene.npz")
                if os.path.exists(surf):
                    state, extra = mem.load_surface_scene(path, t)
                    self._surface[(path, t)] = (
                        GridState(*(jnp.asarray(a) for a in state)), extra)
                occf = os.path.join(path, "training", str(t), "occupancy",
                                    "field.npz")
                if os.path.exists(occf):
                    state, extra = mem.load_occupancy_field(path, t)
                    self._occupancy[(path, t)] = (
                        ProxyState(*(jnp.asarray(a) for a in state)), extra)

    def flush_to_disk(self, scene_path: Optional[str] = None):
        """Persist all device-resident state through an on-disk Memory in the
        exact layout Memory reads (per-frame frames/<n>.npz, depths/<n>.npz,
        surface/scene.npz, occupancy/field.npz, poses/epoch_<e>.npz). This is
        the run's ONE intentional d2h — after it the tunneled runtime
        dispatches synchronously, so call it at epoch boundaries or at the end
        of training."""
        import jax

        mem = Memory(self.scene_memory_paths, self.current_epoch,
                     self.n_trajectories)
        paths = ([scene_path] if scene_path is not None
                 else self.scene_memory_paths)
        with jax.transfer_guard_device_to_host("allow"):
            for path in paths:
                for t in range(self.n_trajectories):
                    n = self._n_frames.get((path, t), 0)
                    if n:
                        st = self._frames[(path, t)]
                        mem.save_frame_batch(
                            path, 0, np.asarray(st.images[:n]),
                            np.asarray(st.zbuf[:n]), np.asarray(st.mask[:n]),
                            np.asarray(st.R[:n]), np.asarray(st.T[:n]),
                            self.zfar, traj=t)
                    ds = self._depths.get((path, t))
                    if ds is not None and ds.n:
                        for i in range(ds.n):
                            mem.save_depth(
                                path, i, np.asarray(ds.depth[i:i + 1]),
                                np.asarray(ds.mask[i:i + 1]),
                                np.asarray(ds.error_mask[i:i + 1]),
                                np.asarray(ds.R[i:i + 1]),
                                np.asarray(ds.T[i:i + 1]), traj=t)
                    if (path, t) in self._surface:
                        state, params = self._surface[(path, t)]
                        mem.save_surface_scene(path, state, traj=t, **params)
                    if (path, t) in self._occupancy:
                        state, params = self._occupancy[(path, t)]
                        mem.save_occupancy_field(path, state, traj=t, **params)
                    for epoch, (X, V, idx, n_m, n_f) in self._poses.get(
                            (path, t), {}).items():
                        X = np.asarray(X)[:n_f] if n_f else np.asarray(X)
                        V = np.asarray(V)[:n_f] if n_f else np.asarray(V)
                        idx = np.asarray(idx)[:n_m] if n_m else np.asarray(idx)
                        mem.save_poses(path, epoch, X, V, idx, traj=t)
        mem.flush()
