"""JAX mesh rasterizer — the TPU replacement for PyTorch3D's CUDA rasterizer.

Replaces `rasterize_meshes` / `MeshRendererWithFragments` (SURVEY.md §2.9 row 1):
produces per-pixel nearest-face id, view-space zbuf (empty pixels = -1, matching
PT3D, reference macarons_utils.py:2294-2337), and barycentric coordinates —
enough for `capture_image`, the GT data generators (orthographic path,
generate_shapenet_data.py:55-66) and flat/Phong shading.

Design: faces are processed in fixed-size chunks with a `lax.scan` carrying the
running (zbuf, face id, barycentrics) over the full image — a brute-force
O(F x H x W / chunk) sweep whose inner body is pure fused elementwise math on
(pixels x chunk) tiles; XLA keeps the temporaries in registers/VMEM-sized
blocks. At the reference's 256x456 with scene meshes this is fast enough for
capture + data generation (the NBV hot path never rasterizes). A pallas
tile-binned version can swap in behind the same API later.

Conventions: +X left/+Y up NDC (pixel (0,0) is top-right in NDC, see
geometry.ndc_pixel_grid); barycentrics are screen-space or perspective-correct
(PT3D uses perspective_correct=True for the GT generators, utils.py:676-706).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .geometry import FoVCamera, OrthoCamera, ndc_pixel_grid


class Fragments(NamedTuple):
    """Rasterization output for one camera batch: (N, H, W[, 3]) arrays."""

    pix_to_face: jnp.ndarray  # int32, -1 = empty
    zbuf: jnp.ndarray  # view-space z, -1 = empty (PT3D convention)
    bary: jnp.ndarray  # (N, H, W, 3) barycentric coords of the winning face


def _face_vertices(verts_proj, faces):
    """verts_proj (V, 3)[x_ndc, y_ndc, z_view]; faces (F, 3) -> (F, 3, 3)."""
    return verts_proj[faces]


@partial(jax.jit, static_argnames=("image_size", "chunk", "perspective_correct"))
def _rasterize_single(verts_proj, faces, image_size, chunk: int,
                      perspective_correct: bool, face_mask=None,
                      eps: float = 1e-8):
    """Rasterize one mesh under one camera. verts_proj (V,3) = (x_ndc, y_ndc, z_view)."""
    H, W = image_size
    F = faces.shape[0]
    n_pix = H * W

    ndc_x, ndc_y = ndc_pixel_grid(H, W, dtype=verts_proj.dtype)
    px = ndc_x.reshape(-1)
    py = ndc_y.reshape(-1)

    fv = _face_vertices(verts_proj, faces)  # (F, 3, 3)
    if face_mask is None:
        face_mask = jnp.ones((F,), bool)

    # Pad faces to a multiple of chunk with invalid faces.
    pad = (-F) % chunk
    if pad:
        fv = jnp.concatenate([fv, jnp.zeros((pad, 3, 3), fv.dtype)], axis=0)
        face_mask = jnp.concatenate([face_mask, jnp.zeros((pad,), bool)], axis=0)
    n_chunks = fv.shape[0] // chunk

    fv_chunks = fv.reshape(n_chunks, chunk, 3, 3)
    fm_chunks = face_mask.reshape(n_chunks, chunk)

    big = jnp.asarray(jnp.inf, verts_proj.dtype)

    def body(carry, inp):
        best_z, best_f, best_b = carry
        fvc, fmc, base_idx = inp
        x0, y0, z0 = fvc[:, 0, 0], fvc[:, 0, 1], fvc[:, 0, 2]
        x1, y1, z1 = fvc[:, 1, 0], fvc[:, 1, 1], fvc[:, 1, 2]
        x2, y2, z2 = fvc[:, 2, 0], fvc[:, 2, 1], fvc[:, 2, 2]

        # Signed area (x2 of triangle); degenerate faces are masked out.
        area = (x1 - x0) * (y2 - y0) - (x2 - x0) * (y1 - y0)  # (C,)
        valid_face = fmc & (jnp.abs(area) > eps) & (z0 > eps) & (z1 > eps) & (z2 > eps)
        inv_area = jnp.where(jnp.abs(area) > eps, 1.0 / area, 0.0)

        # Barycentrics for all pixels x chunk faces: w_i via edge functions.
        dxp = px[:, None]  # (P, 1)
        dyp = py[:, None]
        w0 = ((x1 - dxp) * (y2 - dyp) - (x2 - dxp) * (y1 - dyp)) * inv_area[None, :]
        w1 = ((x2 - dxp) * (y0 - dyp) - (x0 - dxp) * (y2 - dyp)) * inv_area[None, :]
        w2 = 1.0 - w0 - w1

        inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0) & valid_face[None, :]

        if perspective_correct:
            # Correct screen-space barycentrics by 1/z before interpolating.
            iw0 = w0 / z0[None, :]
            iw1 = w1 / z1[None, :]
            iw2 = w2 / z2[None, :]
            denom = iw0 + iw1 + iw2
            denom = jnp.where(jnp.abs(denom) > eps, denom, eps)
            b0, b1, b2 = iw0 / denom, iw1 / denom, iw2 / denom
            z = b0 * z0[None, :] + b1 * z1[None, :] + b2 * z2[None, :]
        else:
            b0, b1, b2 = w0, w1, w2
            z = w0 * z0[None, :] + w1 * z1[None, :] + w2 * z2[None, :]

        inside = inside & (z > eps)
        z_masked = jnp.where(inside, z, big)
        # Nearest face of this chunk per pixel.
        j = jnp.argmin(z_masked, axis=-1)  # (P,)
        rows = jnp.arange(n_pix)
        zc = z_masked[rows, j]
        fc = base_idx + j
        bc = jnp.stack((b0[rows, j], b1[rows, j], b2[rows, j]), axis=-1)

        better = zc < best_z
        best_z = jnp.where(better, zc, best_z)
        best_f = jnp.where(better, fc, best_f)
        best_b = jnp.where(better[:, None], bc, best_b)
        return (best_z, best_f, best_b), None

    init = (
        jnp.full((n_pix,), big, verts_proj.dtype),
        jnp.full((n_pix,), -1, jnp.int32),
        jnp.zeros((n_pix, 3), verts_proj.dtype),
    )
    base_indices = jnp.arange(n_chunks, dtype=jnp.int32) * chunk
    (best_z, best_f, best_b), _ = jax.lax.scan(
        body, init, (fv_chunks, fm_chunks, base_indices)
    )

    empty = ~jnp.isfinite(best_z)
    zbuf = jnp.where(empty, -1.0, best_z).reshape(H, W)
    pix_to_face = jnp.where(empty, -1, best_f).reshape(H, W)
    bary = best_b.reshape(H, W, 3)
    return Fragments(pix_to_face, zbuf, bary)


@partial(jax.jit, static_argnames=("image_size", "tile", "max_faces_per_tile",
                                   "perspective_correct", "tile_batch"))
def _rasterize_single_binned(verts_proj, faces, image_size, tile: int,
                             max_faces_per_tile: int,
                             perspective_correct: bool, face_mask=None,
                             tile_batch: int = 32, eps: float = 1e-8):
    """Tile-binned rasterization: O(F*T + T*K*tile^2) instead of O(F*H*W).

    Faces are binned to the screen tiles their NDC bbox overlaps (top-K per
    tile, smallest face index first — overflow beyond max_faces_per_tile is
    dropped, so size K generously for dense meshes); each tile then rasterizes
    only its own K faces. This is the production path for capture/GT generation
    with large scene meshes; the brute-force scan remains as the reference
    implementation it is validated against.
    """
    H, W = image_size
    F = faces.shape[0]
    pad_h = (-H) % tile
    pad_w = (-W) % tile
    Hp, Wp = H + pad_h, W + pad_w
    TH, TW = Hp // tile, Wp // tile
    T = TH * TW

    ndc_x, ndc_y = ndc_pixel_grid(H, W, dtype=verts_proj.dtype)
    # Pad the pixel grid with out-of-range coords (no face will cover them).
    big_pad = 1e6
    ndc_x = jnp.pad(ndc_x, ((0, pad_h), (0, pad_w)), constant_values=-big_pad)
    ndc_y = jnp.pad(ndc_y, ((0, pad_h), (0, pad_w)), constant_values=-big_pad)
    # (T, tile*tile) pixel coords per tile
    px_t = ndc_x.reshape(TH, tile, TW, tile).transpose(0, 2, 1, 3).reshape(T, -1)
    py_t = ndc_y.reshape(TH, tile, TW, tile).transpose(0, 2, 1, 3).reshape(T, -1)

    fv = verts_proj[faces]  # (F, 3, 3)
    if face_mask is None:
        face_mask = jnp.ones((F,), bool)
    z_ok = jnp.all(fv[..., 2] > eps, axis=-1)
    fx = fv[..., 0]
    fy = fv[..., 1]
    face_x_min = jnp.min(fx, axis=-1)
    face_x_max = jnp.max(fx, axis=-1)
    face_y_min = jnp.min(fy, axis=-1)
    face_y_max = jnp.max(fy, axis=-1)

    # Tile NDC bounds. ndc decreases with pixel index, so bounds flip.
    tile_x_max = jnp.max(px_t, axis=-1)
    tile_x_min = jnp.min(jnp.where(px_t <= -big_pad / 2, big_pad, px_t), axis=-1)
    tile_y_max = jnp.max(py_t, axis=-1)
    tile_y_min = jnp.min(jnp.where(py_t <= -big_pad / 2, big_pad, py_t), axis=-1)

    # Overlap test (T, F): face bbox vs tile bbox (half-pixel slack).
    s = min(H, W)
    slack = 2.0 / (s - 1)
    overlap = (
        (face_x_min[None, :] <= tile_x_max[:, None] + slack)
        & (face_x_max[None, :] >= tile_x_min[:, None] - slack)
        & (face_y_min[None, :] <= tile_y_max[:, None] + slack)
        & (face_y_max[None, :] >= tile_y_min[:, None] - slack)
        & (face_mask & z_ok)[None, :]
    )

    # Per-tile face lists: K smallest overlapping indices.
    neg_big = jnp.float32(-1e18)
    scores = jnp.where(overlap,
                       -jnp.arange(F, dtype=jnp.float32)[None, :], neg_big)
    K = min(max_faces_per_tile, F)
    top_scores, tile_faces = jax.lax.top_k(scores, K)  # (T, K)
    tile_valid = top_scores > neg_big / 2

    x0 = fv[:, 0, 0]
    y0 = fv[:, 0, 1]
    z0 = fv[:, 0, 2]
    x1 = fv[:, 1, 0]
    y1 = fv[:, 1, 1]
    z1 = fv[:, 1, 2]
    x2 = fv[:, 2, 0]
    y2 = fv[:, 2, 1]
    z2 = fv[:, 2, 2]
    area = (x1 - x0) * (y2 - y0) - (x2 - x0) * (y1 - y0)
    inv_area_all = jnp.where(jnp.abs(area) > eps, 1.0 / area, 0.0)
    nondegen = jnp.abs(area) > eps

    big = jnp.asarray(jnp.inf, verts_proj.dtype)

    def per_tile(args):
        f_idx, f_valid, px, py = args  # (K,), (K,), (P,), (P,)
        X0, Y0, Z0 = x0[f_idx], y0[f_idx], z0[f_idx]
        X1, Y1, Z1 = x1[f_idx], y1[f_idx], z1[f_idx]
        X2, Y2, Z2 = x2[f_idx], y2[f_idx], z2[f_idx]
        inv_area = inv_area_all[f_idx]
        valid = f_valid & nondegen[f_idx]

        dxp = px[:, None]
        dyp = py[:, None]
        w0 = ((X1 - dxp) * (Y2 - dyp) - (X2 - dxp) * (Y1 - dyp)) * inv_area[None, :]
        w1 = ((X2 - dxp) * (Y0 - dyp) - (X0 - dxp) * (Y2 - dyp)) * inv_area[None, :]
        w2 = 1.0 - w0 - w1
        inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0) & valid[None, :]

        if perspective_correct:
            iw0 = w0 / Z0[None, :]
            iw1 = w1 / Z1[None, :]
            iw2 = w2 / Z2[None, :]
            denom = iw0 + iw1 + iw2
            denom = jnp.where(jnp.abs(denom) > eps, denom, eps)
            b0, b1, b2 = iw0 / denom, iw1 / denom, iw2 / denom
            z = b0 * Z0[None, :] + b1 * Z1[None, :] + b2 * Z2[None, :]
        else:
            b0, b1, b2 = w0, w1, w2
            z = w0 * Z0[None, :] + w1 * Z1[None, :] + w2 * Z2[None, :]

        inside = inside & (z > eps)
        z_masked = jnp.where(inside, z, big)
        j = jnp.argmin(z_masked, axis=-1)
        rows = jnp.arange(px.shape[0])
        zt = z_masked[rows, j]
        ft = f_idx[j]
        bt = jnp.stack((b0[rows, j], b1[rows, j], b2[rows, j]), axis=-1)
        empty = ~jnp.isfinite(zt)
        return (jnp.where(empty, -1.0, zt), jnp.where(empty, -1, ft),
                jnp.where(empty[:, None], 0.0, bt))

    zt, ft, bt = jax.lax.map(
        per_tile, (tile_faces, tile_valid, px_t, py_t), batch_size=tile_batch)

    def untile(x, channels=None):
        if channels is None:
            x = x.reshape(TH, TW, tile, tile).transpose(0, 2, 1, 3)
            return x.reshape(Hp, Wp)[:H, :W]
        x = x.reshape(TH, TW, tile, tile, channels).transpose(0, 2, 1, 3, 4)
        return x.reshape(Hp, Wp, channels)[:H, :W]

    return Fragments(untile(ft), untile(zt), untile(bt, 3))


def _pairlist_bin(verts_proj_1, faces, image_size, tile: int, K: int,
                  span_cap: int = 2, max_big_faces: int = 2048,
                  eps: float = 1e-8, face_mask=None):
    """Per-tile face lists WITHOUT the (T, F) top_k (VERDICT r2 item 3 /
    ROADMAP 'sorted pair-list' lever).

    Each face enumerates the <= span_cap x span_cap tiles its NDC bbox
    overlaps as (tile, face) pairs; ONE sort of the F*E pair keys groups them
    per tile with faces in ascending order (key = tile * F + face), and a
    searchsorted + gather builds the (T, K) lists. Faces spanning more tiles
    ("big": ground planes, close-up walls — capped at max_big_faces) go
    through a small (T, max_big_faces) overlap test and are merged in by a
    per-tile sort, preserving the ascending-face-id order the first-minimum
    z tie-break depends on. Cost is O(F*E log(F*E)) instead of O(T*F log F).

    Returns (tile_faces (T, K) int32, tile_valid (T, K) bool)."""
    H, W = image_size
    F = faces.shape[0]
    pad_h = (-H) % tile
    pad_w = (-W) % tile
    TH, TW = (H + pad_h) // tile, (W + pad_w) // tile
    T = TH * TW
    s = min(H, W)
    slack = 2.0 / (s - 1)
    dtype = verts_proj_1.dtype

    fv = verts_proj_1[faces]  # (F, 3, 3)
    z_ok = jnp.all(fv[..., 2] > eps, axis=-1)
    ok_face = z_ok if face_mask is None else (face_mask & z_ok)
    fx = fv[..., 0]
    fy = fv[..., 1]
    fxm = jnp.min(fx, axis=-1)
    fxM = jnp.max(fx, axis=-1)
    fym = jnp.min(fy, axis=-1)
    fyM = jnp.max(fy, axis=-1)

    # NDC -> tile-index ranges (x = W/s - 2*col/(s-1); y likewise), widened by
    # a small epsilon so float boundaries never DROP a tile the direct
    # overlap comparison would keep (extra candidates are re-checked exactly).
    def tile_range(lo_v, hi_v, extent, n_tiles):
        # overlap iff lo_v <= t_hi(c)+slack and hi_v >= t_lo(c)-slack
        c_max = jnp.floor(
            (extent / s - lo_v + slack) * (s - 1) / 2.0 / tile + 1e-3)
        c_min = jnp.ceil(
            ((extent / s - hi_v - slack) * (s - 1) / 2.0 + 1.0) / tile
            - 1.0 - 1e-3)
        c_min = jnp.clip(c_min, 0, n_tiles - 1).astype(jnp.int32)
        c_max = jnp.clip(c_max, 0, n_tiles - 1).astype(jnp.int32)
        return c_min, c_max

    cmin, cmax = tile_range(fxm, fxM, float(W), TW)
    rmin, rmax = tile_range(fym, fyM, float(H), TH)
    span_w = cmax - cmin + 1
    span_h = rmax - rmin + 1
    onscreen = ok_face & (span_w >= 1) & (span_h >= 1)
    small = onscreen & (span_w <= span_cap) & (span_h <= span_cap)
    big = onscreen & ~small

    # Exact overlap re-check (the original comparison) for candidate tiles
    cols0 = jnp.arange(TW, dtype=dtype) * tile
    rows0 = jnp.arange(TH, dtype=dtype) * tile
    x_hi = W / s - 2.0 * cols0 / (s - 1)
    x_lo = W / s - 2.0 * (cols0 + tile - 1) / (s - 1)
    y_hi = H / s - 2.0 * rows0 / (s - 1)
    y_lo = H / s - 2.0 * (rows0 + tile - 1) / (s - 1)

    E = span_cap * span_cap
    e = jnp.arange(E, dtype=jnp.int32)
    dy = (e // span_cap)[None, :]  # (1, E)
    dx = (e % span_cap)[None, :]
    r = rmin[:, None] + dy  # (F, E)
    c = cmin[:, None] + dx
    in_span = (dy < span_h[:, None]) & (dx < span_w[:, None]) & small[:, None]
    r_c = jnp.clip(r, 0, TH - 1)
    c_c = jnp.clip(c, 0, TW - 1)
    hit = ((fxm[:, None] <= x_hi[c_c] + slack)
           & (fxM[:, None] >= x_lo[c_c] - slack)
           & (fym[:, None] <= y_hi[r_c] + slack)
           & (fyM[:, None] >= y_lo[r_c] - slack) & in_span)
    tile_id = r_c * TW + c_c  # (F, E)
    face_id = jnp.broadcast_to(jnp.arange(F, dtype=jnp.int32)[:, None],
                               (F, E))
    sentinel = jnp.int32(T) * F
    keys = jnp.where(hit, tile_id * F + face_id, sentinel).reshape(-1)
    sorted_keys, sorted_faces = jax.lax.sort(
        (keys, face_id.reshape(-1)), num_keys=1)

    base = jnp.arange(T, dtype=jnp.int32) * F
    start = jnp.searchsorted(sorted_keys, base)
    end = jnp.searchsorted(sorted_keys, base + F)
    idx = start[:, None] + jnp.arange(K, dtype=jnp.int32)[None, :]  # (T, K)
    valid_small = idx < end[:, None]
    small_faces = sorted_faces[jnp.minimum(idx, F * E - 1)]

    # Big faces: compact then exact-test against every tile (tiny matrix)
    B = min(max_big_faces, F)
    neg_big = jnp.float32(-1e18)
    big_scores = jnp.where(big, -jnp.arange(F, dtype=jnp.float32), neg_big)
    top_s, big_ids = jax.lax.top_k(big_scores, B)  # ascending face ids
    big_ok = top_s > neg_big / 2
    tile_x_max = jnp.tile(x_hi, TH)
    tile_x_min = jnp.tile(x_lo, TH)
    tile_y_max = jnp.repeat(y_hi, TW)
    tile_y_min = jnp.repeat(y_lo, TW)
    big_hit = ((fxm[big_ids][None, :] <= tile_x_max[:, None] + slack)
               & (fxM[big_ids][None, :] >= tile_x_min[:, None] - slack)
               & (fym[big_ids][None, :] <= tile_y_max[:, None] + slack)
               & (fyM[big_ids][None, :] >= tile_y_min[:, None] - slack)
               & big_ok[None, :])  # (T, B)

    # Merge (both lists ascend by face id) via one per-tile sort of K+B lanes
    INVALID = jnp.int32(2**31 - 1)
    merged = jnp.concatenate([
        jnp.where(valid_small, small_faces, INVALID),
        jnp.where(big_hit, big_ids[None, :], INVALID),
    ], axis=1)  # (T, K+B)
    merged = jnp.sort(merged, axis=1)[:, :K]
    tile_valid = merged < INVALID
    return jnp.where(tile_valid, merged, 0), tile_valid


def _pairlist_pairs(f9, image_size, tile: int,
                    span_cap: int = 2, eps: float = 1e-8, face_mask=None):
    """Pair-list binning WITHOUT densification: returns the tile-sorted pair
    arrays a pair-consuming kernel (ops.pallas.tile_raster._pair_kernel) reads
    directly, skipping the two big (T, K) gathers of the dense layout.

    TPU layout notes (measured on v5e-1 at 50k faces, 4-cam batch — together
    49.8 -> ~17 ms for this stage):
    - input is STRUCTURE-OF-ARRAYS f9 (9, F) [rows x0 y0 z0 x1 y1 z1 x2 y2 z2]
      so every bbox/span/hit op vectorises over F lanes (the old (F, 3, 3)
      layout put the reductions on a minor dim of size 3);
    - tile NDC bounds are computed ARITHMETICALLY from the tile index (they
      are affine in it) — the old x_hi[c_c]-style table lookups were four
      (F, E)-sized gathers costing more than the sort itself;
    - the sort carries the key alone (face id = key % F since
      key = tile*F + face) instead of a second operand;
    - segment starts take ONE searchsorted over T+1 boundaries: tile t's
      segment ends where tile t+1's begins.

    Returns (pair10 (F*E, 10) f32 [x0 y0 z0 x1 y1 z1 x2 y2 z2 face_id],
    starts (T,) int32, counts (T,) int32 [valid pairs per tile, contiguous],
    big (F,) bool [faces spanning > span_cap^2 tiles — NOT in the pair list],
    f9 (9, F) f32)."""
    H, W = image_size
    F = f9.shape[1]
    pad_h = (-H) % tile
    pad_w = (-W) % tile
    TH, TW = (H + pad_h) // tile, (W + pad_w) // tile
    T = TH * TW
    s = min(H, W)
    slack = 2.0 / (s - 1)

    x0, y0, z0, x1, y1, z1, x2, y2, z2 = (f9[i] for i in range(9))
    z_ok = (z0 > eps) & (z1 > eps) & (z2 > eps)
    ok_face = z_ok if face_mask is None else (face_mask & z_ok)
    fxm = jnp.minimum(jnp.minimum(x0, x1), x2)
    fxM = jnp.maximum(jnp.maximum(x0, x1), x2)
    fym = jnp.minimum(jnp.minimum(y0, y1), y2)
    fyM = jnp.maximum(jnp.maximum(y0, y1), y2)

    def tile_range(lo_v, hi_v, extent, n_tiles):
        c_max = jnp.floor(
            (extent / s - lo_v + slack) * (s - 1) / 2.0 / tile + 1e-3)
        c_min = jnp.ceil(
            ((extent / s - hi_v - slack) * (s - 1) / 2.0 + 1.0) / tile
            - 1.0 - 1e-3)
        c_min = jnp.clip(c_min, 0, n_tiles - 1).astype(jnp.int32)
        c_max = jnp.clip(c_max, 0, n_tiles - 1).astype(jnp.int32)
        return c_min, c_max

    cmin, cmax = tile_range(fxm, fxM, float(W), TW)
    rmin, rmax = tile_range(fym, fyM, float(H), TH)
    span_w = cmax - cmin + 1
    span_h = rmax - rmin + 1
    onscreen = ok_face & (span_w >= 1) & (span_h >= 1)
    small = onscreen & (span_w <= span_cap) & (span_h <= span_cap)
    big = onscreen & ~small

    E = span_cap * span_cap
    e = jnp.arange(E, dtype=jnp.int32)
    dy = (e // span_cap)[:, None]  # (E, 1)
    dx = (e % span_cap)[:, None]
    r = rmin[None, :] + dy  # (E, F)
    c = cmin[None, :] + dx
    in_span = (dy < span_h[None, :]) & (dx < span_w[None, :]) & small[None, :]
    r_c = jnp.clip(r, 0, TH - 1)
    c_c = jnp.clip(c, 0, TW - 1)
    # Tile NDC bounds are affine in the tile index: compute, don't look up.
    cf = c_c.astype(f9.dtype)
    rf = r_c.astype(f9.dtype)
    x_hi = W / s - 2.0 * (cf * tile) / (s - 1)
    x_lo = W / s - 2.0 * (cf * tile + tile - 1) / (s - 1)
    y_hi = H / s - 2.0 * (rf * tile) / (s - 1)
    y_lo = H / s - 2.0 * (rf * tile + tile - 1) / (s - 1)
    hit = ((fxm[None, :] <= x_hi + slack)
           & (fxM[None, :] >= x_lo - slack)
           & (fym[None, :] <= y_hi + slack)
           & (fyM[None, :] >= y_lo - slack) & in_span)
    tile_id = r_c * TW + c_c  # (E, F)
    face_id = jnp.broadcast_to(jnp.arange(F, dtype=jnp.int32)[None, :],
                               (E, F))
    sentinel = jnp.int32(T) * F
    keys = jnp.where(hit, tile_id * F + face_id, sentinel).reshape(-1)
    # Single-operand sort; key = tile*F + face so face id = key % F (the
    # sentinel T*F maps to face 0, but those lanes sit past every segment's
    # count and are never read). Duplicate keys are impossible (a face enters
    # a tile at most once), so per-tile order ascends by face id exactly as
    # the z tie-break requires.
    sorted_keys = jax.lax.sort(keys)
    sorted_faces = sorted_keys % F

    # Tile t's segment ends where tile t+1's starts: one searchsorted over
    # T+1 band boundaries replaces the two T-sized ones.
    bounds = jnp.arange(T + 1, dtype=jnp.int32) * F
    edges = jnp.searchsorted(sorted_keys, bounds).astype(jnp.int32)
    starts = edges[:-1]
    counts = edges[1:] - starts

    flat = f9.T  # (F, 9) rows for the row-gather below
    pair10 = jnp.concatenate(
        [flat[sorted_faces], sorted_faces[:, None].astype(jnp.float32)],
        axis=1)  # (F*E, 10)
    return pair10, starts, counts, big, f9


def project_fv_batch(verts, faces, camera):
    """World verts + faces -> per-camera SoA face data (N, 9, F) of
    [x0 y0 z0 x1 y1 z1 x2 y2 z2] rows (x/y NDC, z view).

    Gathers `verts[faces]` ONCE in world space and projects the gathered
    copies per camera — N-1 fewer 3F-row gathers than projecting verts and
    gathering per camera (the gather, not the extra projection matmuls, is
    what costs on TPU)."""
    n_cam = camera.R.shape[0]
    F = faces.shape[0]
    fvw = verts[faces].reshape(F * 3, 3)  # one gather
    pts = jnp.broadcast_to(fvw[None], (n_cam, F * 3, 3))
    view = camera.world_to_view(pts)
    ndc = camera.project_view(view)
    out = jnp.concatenate((ndc[..., :2], view[..., 2:]), axis=-1)
    # (N, F, 3, 3)[n, f, v, c] -> (N, 3v+c, f)
    return out.reshape(n_cam, F, 3, 3).transpose(0, 2, 3, 1).reshape(
        n_cam, 9, F)


@partial(jax.jit, static_argnames=("image_size", "tile", "max_faces_per_tile",
                                   "perspective_correct", "binning"))
def _rasterize_batch_binned_pallas(f9_batch, image_size, tile: int,
                                   max_faces_per_tile: int,
                                   perspective_correct: bool, face_mask=None,
                                   binning: str = "topk",
                                   eps: float = 1e-8):
    """Binned rasterization with the per-tile stage as a Pallas kernel
    (ops.pallas.tile_raster): same binning as _rasterize_single_binned, then
    one VMEM-staged kernel instance per tile instead of the lax.map sweep.

    f9_batch (N, 9, F) from project_fv_batch — the WHOLE camera batch
    rasterizes in one kernel launch (each camera's tiles stack on the grid
    axis), so a multi-frame capture (e.g. the 4 interpolation steps of an
    NBV move) is one dispatch."""
    from .pallas.tile_raster import pallas_rasterize_tiles

    H, W = image_size
    N = f9_batch.shape[0]
    F = f9_batch.shape[2]
    pad_h = (-H) % tile
    pad_w = (-W) % tile
    Hp, Wp = H + pad_h, W + pad_w
    TH, TW = Hp // tile, Wp // tile
    T = TH * TW

    if face_mask is None:
        face_mask = jnp.ones((F,), bool)

    # Tile NDC bounds straight from the pixel mapping (x decreases with col)
    s = min(H, W)
    cols0 = jnp.arange(TW, dtype=f9_batch.dtype) * tile
    rows0 = jnp.arange(TH, dtype=f9_batch.dtype) * tile
    x_hi = W / s - 2.0 * cols0 / (s - 1)  # col 0 of each tile (max x)
    x_lo = W / s - 2.0 * (cols0 + tile - 1) / (s - 1)
    y_hi = H / s - 2.0 * rows0 / (s - 1)
    y_lo = H / s - 2.0 * (rows0 + tile - 1) / (s - 1)
    tile_x_max = jnp.tile(x_hi, TH)
    tile_x_min = jnp.tile(x_lo, TH)
    tile_y_max = jnp.repeat(y_hi, TW)
    tile_y_min = jnp.repeat(y_lo, TW)

    slack = 2.0 / (s - 1)
    neg_big = jnp.float32(-1e18)
    K = min(max_faces_per_tile, F)
    K = -(-K // 128) * 128  # lane-align the face axis

    use_pairlist = (binning == "pairlist" and T * (F + 1) < 2**31 - 1)
    interpret = jax.default_backend() == "cpu"

    if use_pairlist:
        from .pallas.tile_raster import pallas_rasterize_pairs

        # Small faces (span <= 2x2 tiles, the overwhelming majority): the
        # tile-sorted pair arrays feed the pair-consuming kernel directly —
        # no dense (T, K) face lists, so no (T, K) small-list gather, no
        # (T, 9, K) fv gather and no slot->face gather (the three dominant
        # costs of the dense layout at 50k faces).
        pair10, starts, counts, big, f9b = jax.vmap(
            lambda f9: _pairlist_pairs(f9, image_size, tile,
                                       face_mask=face_mask, eps=eps)
        )(f9_batch)
        FE = pair10.shape[1]
        k_chunk = 256
        pad = (-FE) % k_chunk
        if pad:
            pair10 = jnp.pad(pair10, ((0, 0), (0, pad), (0, 0)))
        FEp = FE + pad
        pfv = pair10.reshape(N * FEp, 10).T  # (10, N*FEp)
        starts_g = (starts
                    + (jnp.arange(N, dtype=jnp.int32) * FEp)[:, None]
                    ).reshape(-1)
        counts_g = counts.reshape(-1)
        zs, fids, b0s, b1s = pallas_rasterize_pairs(
            pfv, starts_g, counts_g, tile, TW, H, W, n_tiles=T,
            k_chunk=k_chunk, K_cap=K,
            perspective_correct=perspective_correct, interpret=interpret)
        zs, fids, b0s, b1s = (x[:, 0, :] for x in (zs, fids, b0s, b1s))

        # Big faces (ground planes, close-up walls) go through a narrow dense
        # pass and fold in with a face-id tie-break; scenes without any big
        # face skip the whole branch at runtime (lax.cond).
        Kb = 128

        def no_big():
            z = jnp.full((N * T, tile * tile), -1.0, jnp.float32)
            return z, z, jnp.zeros_like(z), jnp.zeros_like(z)

        def with_big():
            B = min(2048, F)

            def one(f9_c, big_c):
                fxm = jnp.minimum(jnp.minimum(f9_c[0], f9_c[3]), f9_c[6])
                fxM = jnp.maximum(jnp.maximum(f9_c[0], f9_c[3]), f9_c[6])
                fym = jnp.minimum(jnp.minimum(f9_c[1], f9_c[4]), f9_c[7])
                fyM = jnp.maximum(jnp.maximum(f9_c[1], f9_c[4]), f9_c[7])
                bsc = jnp.where(big_c, -jnp.arange(F, dtype=jnp.float32),
                                neg_big)
                tops, big_ids = jax.lax.top_k(bsc, B)  # ascending face ids
                bok = tops > neg_big / 2
                bhit = ((fxm[big_ids][None, :] <= tile_x_max[:, None] + slack)
                        & (fxM[big_ids][None, :] >= tile_x_min[:, None] - slack)
                        & (fym[big_ids][None, :] <= tile_y_max[:, None] + slack)
                        & (fyM[big_ids][None, :] >= tile_y_min[:, None] - slack)
                        & bok[None, :])  # (T, B)
                # First Kb hits per tile in lane order = ascending face ids
                lsc = jnp.where(
                    bhit, -jnp.arange(B, dtype=jnp.float32)[None, :], neg_big)
                if B < Kb:  # tiny meshes: top_k k must be <= the lane count
                    lsc = jnp.pad(lsc, ((0, 0), (0, Kb - B)),
                                  constant_values=neg_big)
                t2, lidx = jax.lax.top_k(lsc, Kb)
                lidx = jnp.minimum(lidx, B - 1)
                bvalid = t2 > neg_big / 2
                bfaces = big_ids[lidx]  # (T, Kb)
                bfv = jnp.moveaxis(f9_c.T[bfaces], -1, 1)  # (T, 9, Kb)
                return bfv, bvalid, bfaces

            bfv, bvalid, bfaces = jax.vmap(one)(f9b, big)
            zb_t, slotb, b0b, b1b = pallas_rasterize_tiles(
                bfv.reshape(N * T, 9, Kb),
                bvalid.reshape(N * T, Kb).astype(jnp.float32)[:, None, :],
                tile, TW, H, W, n_tiles=T,
                perspective_correct=perspective_correct, interpret=interpret)
            zb_t, slotb, b0b, b1b = (x[:, 0, :] for x in
                                     (zb_t, slotb, b0b, b1b))
            sloti = jnp.maximum(slotb.astype(jnp.int32), 0)
            fidb = jnp.take_along_axis(bfaces.reshape(N * T, Kb), sloti,
                                       axis=1).astype(jnp.float32)
            fidb = jnp.where(slotb >= 0, fidb, -1.0)
            return zb_t, fidb, b0b, b1b

        zb, fidb, b0b, b1b = jax.lax.cond(jnp.any(big), with_big, no_big)
        hit_s = fids >= 0
        hit_b = fidb >= 0
        # z tie across the two passes: smaller face id wins (the single-pass
        # argmin tie-break; ids in both passes are exact in f32).
        better = hit_b & (~hit_s | (zb < zs)
                          | ((zb == zs) & (fidb < fids)))
        zbuf_t = jnp.where(better, zb, zs)
        fidm = jnp.where(better, fidb, fids)
        b0 = jnp.where(better, b0b, b0s)
        b1 = jnp.where(better, b1b, b1s)
        hit = fidm >= 0
        face_id = jnp.where(hit, fidm.astype(jnp.int32), -1)
        bary = jnp.stack((b0, b1, jnp.where(hit, 1.0 - b0 - b1, 0.0)),
                         axis=-1)
    else:
        def bin_one(f9):
            """Per-camera binning: (9, F) -> (tile_fv (T,9,K), valid, faces)."""
            z_ok = (f9[2] > eps) & (f9[5] > eps) & (f9[8] > eps)
            fxm = jnp.minimum(jnp.minimum(f9[0], f9[3]), f9[6])
            fxM = jnp.maximum(jnp.maximum(f9[0], f9[3]), f9[6])
            fym = jnp.minimum(jnp.minimum(f9[1], f9[4]), f9[7])
            fyM = jnp.maximum(jnp.maximum(f9[1], f9[4]), f9[7])
            ok_face = face_mask & z_ok
            overlap = (
                (fxm[None, :] <= tile_x_max[:, None] + slack)
                & (fxM[None, :] >= tile_x_min[:, None] - slack)
                & (fym[None, :] <= tile_y_max[:, None] + slack)
                & (fyM[None, :] >= tile_y_min[:, None] - slack)
                & ok_face[None, :]
            )
            # K smallest overlapping face indices per tile via (T, F) top_k
            # (~29 of 32 ms at 50k faces on v5e-1 — the pairlist binning
            # replaces this sort; cumsum+scatter, cumsum+searchsorted and
            # two-level binning all measured slower or overflow-lossy).
            scores = jnp.where(
                overlap, -jnp.arange(F, dtype=jnp.float32)[None, :], neg_big)
            top_scores, tile_faces = jax.lax.top_k(scores, min(K, F))
            if K > F:
                tile_faces = jnp.pad(tile_faces, ((0, 0), (0, K - F)))
                top_scores = jnp.pad(top_scores, ((0, 0), (0, K - F)),
                                     constant_values=neg_big)
            tile_valid = top_scores > neg_big / 2
            # Stage per-tile face data: (T, 9, K)
            flat = f9.T  # (F, 9) x0 y0 z0 x1 y1 z1 x2 y2 z2
            tile_fv = jnp.moveaxis(flat[tile_faces], -1, 1)
            return tile_fv, tile_valid, tile_faces

        tile_fv, tile_valid, tile_faces = jax.vmap(bin_one)(f9_batch)
        tile_fv = tile_fv.reshape(N * T, 9, K)
        tile_valid = tile_valid.reshape(N * T, K)
        tile_faces = tile_faces.reshape(N * T, K)

        zbuf_t, slot_t, b0_t, b1_t = pallas_rasterize_tiles(
            tile_fv, tile_valid.astype(jnp.float32)[:, None, :], tile, TW, H,
            W, n_tiles=T, perspective_correct=perspective_correct,
            interpret=interpret)
        zbuf_t, slot_t, b0_t, b1_t = (x[:, 0, :] for x in
                                      (zbuf_t, slot_t, b0_t, b1_t))

        # slot -> global face id
        slot_i = jnp.maximum(slot_t.astype(jnp.int32), 0)
        face_id = jnp.take_along_axis(tile_faces, slot_i, axis=1)
        hit = slot_t >= 0
        face_id = jnp.where(hit, face_id, -1)
        b0 = jnp.where(hit, b0_t, 0.0)
        b1 = jnp.where(hit, b1_t, 0.0)
        bary = jnp.stack((b0, b1, jnp.where(hit, 1.0 - b0 - b1, 0.0)),
                         axis=-1)

    def untile(x, channels=None):
        if channels is None:
            x = x.reshape(N, TH, TW, tile, tile).transpose(0, 1, 3, 2, 4)
            return x.reshape(N, Hp, Wp)[:, :H, :W]
        x = x.reshape(N, TH, TW, tile, tile, channels).transpose(0, 1, 3, 2, 4, 5)
        return x.reshape(N, Hp, Wp, channels)[:, :H, :W]

    return Fragments(untile(face_id), untile(zbuf_t), untile(bary, 3))


def project_verts(verts, camera):
    """World verts (V,3) -> (x_ndc, y_ndc, z_view) stack for one camera (no batch)."""
    view = camera.world_to_view(verts[None])[0]
    ndc = camera.project_view(view[None])[0]
    return jnp.concatenate((ndc[..., :2], view[..., 2:]), axis=-1)


def project_verts_batch(verts, camera):
    """World verts (V, 3) -> per-camera (N, V, 3) of (x_ndc, y_ndc, z_view)."""
    n_cam = camera.R.shape[0]
    pts = jnp.broadcast_to(verts[None], (n_cam, *verts.shape))
    view = camera.world_to_view(pts)
    ndc = camera.project_view(view)
    return jnp.concatenate((ndc[..., :2], view[..., 2:]), axis=-1)


# Default binning stage for the pallas path. 'pairlist' avoids the (T, F)
# top_k via a sorted (face, tile) pair list feeding the pair-consuming kernel
# directly; on v5e-1 at 50k faces / 4-cam batch it measures 4.3 vs 31.5
# ms/frame (7.3x, exact pixel match) with the SoA binning + row-per-step
# kernel. Benchmark: data_tools/bench_rasterizer.py.
PALLAS_BINNING = "pairlist"


def rasterize(verts, faces, camera, image_size, chunk: int = 256,
              perspective_correct: bool = True, face_mask=None,
              method: str = "auto", tile: int = 16,
              max_faces_per_tile: int = 1024,
              binning: str = None):
    """Rasterize a mesh under a (batched) FoV or orthographic camera.

    verts (V, 3), faces (F, 3); camera with batch shape (N,); image_size (H, W).
    method: 'scan' (brute force, exact for any face count), 'binned' (tiled,
    fast for large meshes; drops faces beyond max_faces_per_tile per tile), or
    'auto' (binned when F > 4 * max_faces_per_tile).
    Returns Fragments with arrays shaped (N, H, W[, 3]).

    The whole camera batch runs in ONE device program (vmapped scan/binned, or
    camera-stacked tile grid for the pallas path) — multi-frame captures are a
    single dispatch instead of one launch per camera.
    """
    if not isinstance(camera, (FoVCamera, OrthoCamera)):
        raise TypeError(type(camera))

    F = faces.shape[0]
    if method == "auto":
        if F > 4 * max_faces_per_tile:
            # On TPU the Pallas pair-list path is ~6.7x the XLA binned path
            # (14.3 vs 96 ms at 50k faces); on CPU it would run interpreted.
            method = ("pallas" if jax.default_backend() == "tpu"
                      else "binned")
        else:
            method = "scan"

    if method == "pallas":
        f9 = project_fv_batch(verts, faces, camera)  # (N, 9, F)
        return _rasterize_batch_binned_pallas(
            f9, tuple(image_size), tile, max_faces_per_tile,
            perspective_correct, face_mask=face_mask,
            binning=binning or PALLAS_BINNING)
    vp = project_verts_batch(verts, camera)  # (N, V, 3)
    if method == "binned":
        return jax.vmap(lambda v: _rasterize_single_binned(
            v, faces, tuple(image_size), tile, max_faces_per_tile,
            perspective_correct, face_mask=face_mask))(vp)
    return jax.vmap(lambda v: _rasterize_single(
        v, faces, tuple(image_size), chunk, perspective_correct,
        face_mask=face_mask))(vp)


# ---------------------------------------------------------------------------
# Shading (flat, point lights) — reference utils.py:731-807
# ---------------------------------------------------------------------------


class PointLights(NamedTuple):
    """PT3D-style point lights (defaults: ambient 0.5, diffuse 0.3, specular 0.2)."""

    location: jnp.ndarray  # (L, 3)
    ambient_color: jnp.ndarray  # (L, 3)
    diffuse_color: jnp.ndarray  # (L, 3)
    specular_color: jnp.ndarray  # (L, 3)

    @classmethod
    def create(cls, location, ambient=0.5, diffuse=0.3, specular=0.2):
        location = jnp.atleast_2d(jnp.asarray(location, jnp.float32))
        L = location.shape[0]

        def col(v):
            v = jnp.asarray(v, jnp.float32)
            if v.ndim == 0:
                v = jnp.full((L, 3), v)
            return jnp.broadcast_to(jnp.atleast_2d(v), (L, 3))

        return cls(location, col(ambient), col(diffuse), col(specular))


def front_face_mask(verts, faces, camera):
    """Faces kept by backface culling for a (batch-1) camera
    (PT3D RasterizationSettings(cull_backfaces=True), used by the reference's
    occupied-pose detector, data/scenes/generate_scene_data.py:89-121).

    Computed in view space — a face is culled when its geometric normal points
    away from the camera (the screen-space signed-area test PT3D uses breaks
    for faces behind the camera plane, which matters precisely for the
    inside-a-mesh case this feeds)."""
    n = face_normals(verts, faces)  # (F, 3), orientation from vertex winding
    centers = verts[faces].mean(axis=1)  # (F, 3)
    view_dir = centers - camera.camera_center().reshape(1, 3)
    return jnp.sum(n * view_dir, axis=-1) < 0


def face_normals(verts, faces):
    """Unit per-face normals (F, 3)."""
    fv = verts[faces]
    n = jnp.cross(fv[:, 1] - fv[:, 0], fv[:, 2] - fv[:, 0])
    return n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)


def interpolate_face_attributes(fragments: Fragments, face_attrs):
    """Barycentric interpolation of per-face-vertex attributes.

    face_attrs (F, 3, C) -> (N, H, W, C) for the winning faces."""
    f = jnp.maximum(fragments.pix_to_face, 0)
    attrs = face_attrs[f]  # (N, H, W, 3, C)
    out = jnp.einsum("...k,...kc->...c", fragments.bary, attrs)
    return jnp.where(fragments.pix_to_face[..., None] >= 0, out, 0.0)


def sample_texture_atlas(fragments: Fragments, atlas, mode: str = "nearest"):
    """Sample a PT3D-style per-face texture atlas (F, R, R, 3) at the winning
    faces' barycentrics (TexturesAtlas semantics: grid coords from (w0, w1),
    align_corners). Returns (N, H, W, 3)."""
    Rres = atlas.shape[1]
    f = jnp.maximum(fragments.pix_to_face, 0)
    w0 = jnp.clip(fragments.bary[..., 0], 0.0, 1.0)
    w1 = jnp.clip(fragments.bary[..., 1], 0.0, 1.0)
    if mode == "nearest":
        iy = jnp.round(w0 * (Rres - 1)).astype(jnp.int32)
        ix = jnp.round(w1 * (Rres - 1)).astype(jnp.int32)
        tex = atlas[f, iy, ix]
    else:
        gy = w0 * (Rres - 1)
        gx = w1 * (Rres - 1)
        y0 = jnp.floor(gy).astype(jnp.int32)
        x0 = jnp.floor(gx).astype(jnp.int32)
        y1 = jnp.minimum(y0 + 1, Rres - 1)
        x1 = jnp.minimum(x0 + 1, Rres - 1)
        wy = (gy - y0)[..., None]
        wx = (gx - x0)[..., None]
        tex = (atlas[f, y0, x0] * (1 - wy) * (1 - wx)
               + atlas[f, y0, x1] * (1 - wy) * wx
               + atlas[f, y1, x0] * wy * (1 - wx)
               + atlas[f, y1, x1] * wy * wx)
    return jnp.where(fragments.pix_to_face[..., None] >= 0, tex, 0.0)


def flat_shading(fragments: Fragments, verts, faces, texels, lights: PointLights,
                 camera_center, shininess: float = 64.0):
    """Per-face-normal Phong lighting (PT3D flat_shading semantics).

    texels (N, H, W, 3) surface albedo; returns shaded RGB (N, H, W, 3).
    colors = texels * (ambient + diffuse) + specular.
    """
    normals = face_normals(verts, faces)  # (F, 3)
    f = jnp.maximum(fragments.pix_to_face, 0)
    pix_normals = normals[f]  # (N, H, W, 3)

    # World position of each pixel via barycentric interpolation.
    fv = verts[faces]  # (F, 3, 3)
    pix_pos = interpolate_face_attributes(fragments, fv)

    amb = jnp.sum(lights.ambient_color, axis=0)  # (3,)

    light_dir = lights.location[None, None, None, :, :] - pix_pos[..., None, :]
    light_dir = light_dir / jnp.maximum(
        jnp.linalg.norm(light_dir, axis=-1, keepdims=True), 1e-12
    )
    n = pix_normals[..., None, :]
    cos = jnp.maximum(jnp.sum(n * light_dir, axis=-1), 0.0)  # (N,H,W,L)
    diffuse = jnp.sum(cos[..., None] * lights.diffuse_color, axis=-2)

    view_dir = camera_center[:, None, None, None, :] - pix_pos[..., None, :]
    view_dir = view_dir / jnp.maximum(
        jnp.linalg.norm(view_dir, axis=-1, keepdims=True), 1e-12
    )
    reflect = 2.0 * jnp.sum(n * light_dir, axis=-1, keepdims=True) * n - light_dir
    spec_cos = jnp.maximum(jnp.sum(reflect * view_dir, axis=-1), 0.0)
    specular = jnp.sum(
        (spec_cos ** shininess)[..., None] * lights.specular_color, axis=-2
    )

    colors = texels * (amb + diffuse) + specular
    return colors


def render_mesh(verts, faces, camera, image_size, lights: PointLights,
                vert_colors=None, face_colors=None, texture_atlas=None,
                background=1.0, chunk: int = 256,
                perspective_correct: bool = False, face_mask=None):
    """Full render: rasterize + flat-shade + hard blend over a background.

    Reproduces the reference capture pipeline (MeshRendererWithFragments with
    SoftFlatShader at blur=0, macarons_utils.py:706-737): returns
    (images (N, H, W, 3), Fragments). Texture source: per-vertex colors
    (interpolated), per-face colors, or a PT3D-style per-face texture atlas
    (F, R, R, 3); default albedo 1.
    """
    frags = rasterize(verts, faces, camera, image_size, chunk=chunk,
                      perspective_correct=perspective_correct,
                      face_mask=face_mask)
    if texture_atlas is not None:
        texels = sample_texture_atlas(frags, texture_atlas)
    elif vert_colors is not None:
        texels = interpolate_face_attributes(frags, vert_colors[faces])
    elif face_colors is not None:
        texels = face_colors[jnp.maximum(frags.pix_to_face, 0)]
    else:
        texels = jnp.ones((*frags.zbuf.shape, 3), verts.dtype)

    colors = flat_shading(
        frags, verts, faces, texels, lights, camera.camera_center()
    )
    valid = (frags.pix_to_face >= 0)[..., None]
    images = jnp.where(valid, colors, background)
    return images, frags
