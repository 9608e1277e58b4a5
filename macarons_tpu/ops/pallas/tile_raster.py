"""Pallas TPU kernel: per-tile rasterization (stage 2 of the binned rasterizer).

The XLA binned path (ops.rasterizer._rasterize_single_binned) spends most of
its time in the per-tile lax.map: (tiles x pixels x K faces) edge tests as a
chain of HBM-bound elementwise ops. This kernel runs one screen tile per grid
step with the tile's K pre-binned faces staged in VMEM: pixel coordinates are
generated from the program id (no pixel-grid input), all (P, k_chunk)
intermediates (edge functions, perspective barycentrics, z) live in
VMEM/registers, and the winner reduction (first smallest-z face) happens
in-kernel. Outputs are the per-tile zbuf, winning SLOT (into the tile's face
list), and two barycentrics; the host maps slots back to global face ids with
one cheap gather.

The face axis is processed in k_chunk-lane chunks on a second grid dimension
(consecutive chunk steps revisit the tile's output block and fold a running
minimum) — keeping the (P, k) working set small enough to stay
VMEM/register-resident at K=1024+ instead of spilling.

Semantics match _rasterize_single_binned's per_tile exactly (top-left fill
conventions, z > eps gate, first-minimum tie-break by face-list order: strict
< across chunks keeps the earliest chunk's winner, the lane-min keeps the
earliest lane within a chunk).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 3.0e38


def _tile_kernel(count_ref, fv_ref, valid_ref, zbuf_ref, slot_ref, b0_ref,
                 b1_ref, *, tile: int, TW: int, H: int, W: int, n_tiles: int,
                 k_chunk: int, perspective_correct: bool, eps: float):
    # n_tiles = tiles per image; grid steps beyond that are further cameras'
    # tiles of the SAME screen layout (multi-camera capture batching).
    i = pl.program_id(0)
    t = i % n_tiles
    c = pl.program_id(1)
    ty = t // TW
    tx = t % TW
    P = tile * tile

    # Valid lanes are contiguous from 0 (both binning stages emit valid-first
    # lists), so a chunk whose first lane is past the tile's face count holds
    # no work: skip the whole (P, k_chunk) edge-test body. Typical tiles fill
    # ~1 of K/k_chunk chunks, so this predication removes most VPU work.
    active = c * k_chunk < count_ref[i]

    @pl.when(active)
    def _body():
        pidx = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
        di = (pidx // tile).astype(jnp.float32)
        dj = (pidx % tile).astype(jnp.float32)
        s = float(min(H, W))
        row = ty.astype(jnp.float32) * tile + di  # (P, 1)
        col = tx.astype(jnp.float32) * tile + dj
        # PT3D NDC pixel mapping (ops.geometry.ndc_pixel_grid)
        px = W / s - 2.0 * col / (s - 1.0)
        py = H / s - 2.0 * row / (s - 1.0)
        pix_ok = (row < H) & (col < W)  # padded tiles spill past the image

        def fr(k):
            return fv_ref[0, k, :][None, :]  # (1, k_chunk)

        x0, y0, z0 = fr(0), fr(1), fr(2)
        x1, y1, z1 = fr(3), fr(4), fr(5)
        x2, y2, z2 = fr(6), fr(7), fr(8)
        valid = valid_ref[0, 0, :][None, :] > 0.0

        area = (x1 - x0) * (y2 - y0) - (x2 - x0) * (y1 - y0)
        nondegen = jnp.abs(area) > eps
        inv_area = jnp.where(nondegen, 1.0 / jnp.where(nondegen, area, 1.0),
                             0.0)

        w0 = ((x1 - px) * (y2 - py) - (x2 - px) * (y1 - py)) * inv_area
        w1 = ((x2 - px) * (y0 - py) - (x0 - px) * (y2 - py)) * inv_area
        w2 = 1.0 - w0 - w1
        inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0) & valid & nondegen & pix_ok

        if perspective_correct:
            iw0 = w0 / z0
            iw1 = w1 / z1
            iw2 = w2 / z2
            denom = iw0 + iw1 + iw2
            denom = jnp.where(jnp.abs(denom) > eps, denom, eps)
            b0 = iw0 / denom
            b1 = iw1 / denom
            z = b0 * z0 + b1 * z1 + (1.0 - b0 - b1) * z2
        else:
            b0, b1 = w0, w1
            z = w0 * z0 + w1 * z1 + w2 * z2

        inside = inside & (z > eps)
        zm = jnp.where(inside, z, _BIG)
        zmin = jnp.min(zm, axis=1, keepdims=True)  # (P, 1)
        cand = (zm <= zmin) & inside
        K = zm.shape[1]
        # First minimum in face-list order wins (matches argmin semantics):
        # smallest lane index among the minima (no cumsum in Pallas TPU)
        lane = jax.lax.broadcasted_iota(jnp.int32, (P, K), 1).astype(
            jnp.float32)
        slot = jnp.min(jnp.where(cand, lane, _BIG), axis=1, keepdims=True)
        fm = (cand & (lane <= slot)).astype(jnp.float32)
        b0s = jnp.sum(fm * b0, axis=1)
        b1s = jnp.sum(fm * b1, axis=1)
        hit = slot[:, 0] < _BIG / 2
        gslot = slot[:, 0] + c.astype(jnp.float32) * k_chunk  # global slot
        znew = zmin[:, 0]

        @pl.when(c == 0)
        def _init():
            zbuf_ref[0, 0, :] = jnp.where(hit, znew, -1.0)
            slot_ref[0, 0, :] = jnp.where(hit, gslot, -1.0)
            b0_ref[0, 0, :] = jnp.where(hit, b0s, 0.0)
            b1_ref[0, 0, :] = jnp.where(hit, b1s, 0.0)

        @pl.when(c > 0)
        def _fold():
            cur_z = zbuf_ref[0, 0, :]
            cur_has = slot_ref[0, 0, :] >= 0.0
            # Strict < : on a z tie across chunks the EARLIER chunk (lower
            # face index) keeps the pixel, matching the single-pass argmin.
            better = hit & (~cur_has | (znew < cur_z))
            zbuf_ref[0, 0, :] = jnp.where(better, znew, cur_z)
            slot_ref[0, 0, :] = jnp.where(better, gslot, slot_ref[0, 0, :])
            b0_ref[0, 0, :] = jnp.where(better, b0s, b0_ref[0, 0, :])
            b1_ref[0, 0, :] = jnp.where(better, b1s, b1_ref[0, 0, :])

    @pl.when(jnp.logical_not(active) & (c == 0))
    def _empty_init():
        # Tile with no faces at all: outputs still need the empty sentinel.
        zbuf_ref[0, 0, :] = jnp.full((P,), -1.0, jnp.float32)
        slot_ref[0, 0, :] = jnp.full((P,), -1.0, jnp.float32)
        b0_ref[0, 0, :] = jnp.zeros((P,), jnp.float32)
        b1_ref[0, 0, :] = jnp.zeros((P,), jnp.float32)


def _pair_row_kernel(starts_ref, counts_ref, pfv_ref, zbuf_ref, fid_ref,
                     b0_ref, b1_ref, *, tile: int, TW: int, H: int, W: int,
                     n_tiles: int, k_chunk: int, CW: int, NFE: int,
                     K_cap: int, perspective_correct: bool, eps: float):
    """Pair-list-consuming kernel, ONE grid step per tile: the tile's whole
    contiguous segment [start, start+count) of the tile-sorted pair array
    pfv (10, NFE) — rows x0 y0 z0 x1 y1 z1 x2 y2 z2 face_id — arrives as a
    single element-offset block (10, CW), and a dynamic-trip fori_loop folds
    its k_chunk-wide sub-chunks in REGISTERS, writing each output block once.
    vs the previous (tiles x chunks) 2-D grid this cuts grid steps ~5x (most
    tiles hold 1 active chunk out of K_cap/k_chunk) and drops the per-chunk
    output-block init/fold revisits — the per-step fixed cost dominated the
    kernel at 50k faces (16.9 -> ~7 ms measured on v5e-1).

    Ties: within a sub-chunk the smallest lane wins = smallest face id
    (segments ascend by face id); across sub-chunks strict < keeps the
    earlier chunk = smaller ids. Exactly the single-pass argmin tie-break."""
    i = pl.program_id(0)
    t = i % n_tiles
    ty = t // TW
    tx = t % TW
    P = tile * tile

    start = starts_ref[i]
    count = jnp.minimum(counts_ref[i], K_cap)
    # Same clamped element offset the BlockSpec index map used.
    off = jnp.minimum(start // k_chunk, (NFE - CW) // k_chunk) * k_chunk
    ofs = start - off

    pidx = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
    di = (pidx // tile).astype(jnp.float32)
    dj = (pidx % tile).astype(jnp.float32)
    s = float(min(H, W))
    row = ty.astype(jnp.float32) * tile + di  # (P, 1)
    col = tx.astype(jnp.float32) * tile + dj
    # PT3D NDC pixel mapping (ops.geometry.ndc_pixel_grid)
    px = W / s - 2.0 * col / (s - 1.0)
    py = H / s - 2.0 * row / (s - 1.0)
    pix_ok = (row < H) & (col < W)  # padded tiles spill past the image

    j_lo = ofs // k_chunk  # 0 unless the offset clamped at the array end
    j_hi = (ofs + count + k_chunk - 1) // k_chunk

    def body(j, carry):
        best_z, best_fid, best_b0, best_b1 = carry
        lane0 = j * k_chunk
        lanepos = lane0 + jax.lax.broadcasted_iota(jnp.int32, (1, k_chunk), 1)
        valid = (lanepos >= ofs) & (lanepos < ofs + count)
        blk = pfv_ref[:, pl.dslice(lane0, k_chunk)]  # (10, k_chunk)

        def fr(k):
            return blk[k, :][None, :]  # (1, k_chunk)

        x0, y0, z0 = fr(0), fr(1), fr(2)
        x1, y1, z1 = fr(3), fr(4), fr(5)
        x2, y2, z2 = fr(6), fr(7), fr(8)
        fid = fr(9)

        area = (x1 - x0) * (y2 - y0) - (x2 - x0) * (y1 - y0)
        nondegen = jnp.abs(area) > eps
        inv_area = jnp.where(nondegen, 1.0 / jnp.where(nondegen, area, 1.0),
                             0.0)

        w0 = ((x1 - px) * (y2 - py) - (x2 - px) * (y1 - py)) * inv_area
        w1 = ((x2 - px) * (y0 - py) - (x0 - px) * (y2 - py)) * inv_area
        w2 = 1.0 - w0 - w1
        inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0) & valid & nondegen & pix_ok

        if perspective_correct:
            iw0 = w0 / z0
            iw1 = w1 / z1
            iw2 = w2 / z2
            denom = iw0 + iw1 + iw2
            denom = jnp.where(jnp.abs(denom) > eps, denom, eps)
            b0 = iw0 / denom
            b1 = iw1 / denom
            z = b0 * z0 + b1 * z1 + (1.0 - b0 - b1) * z2
        else:
            b0, b1 = w0, w1
            z = w0 * z0 + w1 * z1 + w2 * z2

        inside = inside & (z > eps)
        zm = jnp.where(inside, z, _BIG)
        zmin = jnp.min(zm, axis=1, keepdims=True)  # (P, 1)
        cand = (zm <= zmin) & inside
        K = zm.shape[1]
        lane = jax.lax.broadcasted_iota(jnp.int32, (P, K), 1).astype(
            jnp.float32)
        slot = jnp.min(jnp.where(cand, lane, _BIG), axis=1, keepdims=True)
        fm = (cand & (lane <= slot)).astype(jnp.float32)
        b0s = jnp.sum(fm * b0, axis=1)
        b1s = jnp.sum(fm * b1, axis=1)
        fids = jnp.sum(fm * fid, axis=1)
        hit = slot[:, 0] < _BIG / 2
        znew = zmin[:, 0]

        # Strict <: on a z tie the earlier sub-chunk (smaller face id) wins.
        better = hit & (znew < best_z)
        return (jnp.where(better, znew, best_z),
                jnp.where(better, fids, best_fid),
                jnp.where(better, b0s, best_b0),
                jnp.where(better, b1s, best_b1))

    init = (jnp.full((P,), _BIG, jnp.float32),
            jnp.full((P,), -1.0, jnp.float32),
            jnp.zeros((P,), jnp.float32),
            jnp.zeros((P,), jnp.float32))
    best_z, best_fid, best_b0, best_b1 = jax.lax.fori_loop(
        j_lo, j_hi, body, init)

    hit = best_fid >= 0.0
    zbuf_ref[0, 0, :] = jnp.where(hit, best_z, -1.0)
    fid_ref[0, 0, :] = best_fid
    b0_ref[0, 0, :] = best_b0
    b1_ref[0, 0, :] = best_b1


@partial(jax.jit, static_argnames=("tile", "TW", "H", "W", "n_tiles",
                                   "k_chunk", "K_cap", "perspective_correct",
                                   "interpret"))
def pallas_rasterize_pairs(pfv, starts, counts, tile: int, TW: int, H: int,
                           W: int, n_tiles: int,
                           k_chunk: int = 256, K_cap: int = 1024,
                           perspective_correct: bool = True,
                           interpret: bool = False, eps: float = 1e-8):
    """Rasterize from a tile-sorted pair array. pfv (10, NFE) f32 (rows
    x0 y0 z0 x1 y1 z1 x2 y2 z2 face_id; NFE a multiple of k_chunk); starts /
    counts (R,) int32 give each grid row's contiguous pair segment (R = n_cams
    * n_tiles; camera k's tiles occupy rows [k*n_tiles, (k+1)*n_tiles)).

    Returns (zbuf, fid, b0, b1), each (R, 1, P) (fid f32, -1 = empty)."""
    NFE = pfv.shape[1]
    assert NFE % k_chunk == 0, (NFE, k_chunk)
    R = starts.shape[0]
    # A segment of up to K_cap pairs starting at any offset within its first
    # chunk spans at most this many k_chunk lanes.
    CW = ((K_cap - 1) // k_chunk + 2) * k_chunk
    if NFE < CW:
        pfv = jnp.pad(pfv, ((0, 0), (0, CW - NFE)))
        NFE = CW
    P = tile * tile
    out_shape = [
        jax.ShapeDtypeStruct((R, 1, P), jnp.float32),
        jax.ShapeDtypeStruct((R, 1, P), jnp.float32),
        jax.ShapeDtypeStruct((R, 1, P), jnp.float32),
        jax.ShapeDtypeStruct((R, 1, P), jnp.float32),
    ]
    out_spec = pl.BlockSpec((1, 1, P), lambda i, s, c: (i, 0, 0))

    def pfv_map(i, s, c):
        # Element offset of the tile's window, clamped to stay in-array; the
        # kernel recomputes the same offset to locate ofs = start - off.
        # (min BEFORE the multiply so Mosaic can prove 128 | offset.)
        return (0, jnp.minimum(s[i] // k_chunk,
                               (NFE - CW) // k_chunk) * k_chunk)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(R,),
        in_specs=[pl.BlockSpec((pl.Element(10), pl.Element(CW)), pfv_map)],
        out_specs=[out_spec, out_spec, out_spec, out_spec],
    )
    return pl.pallas_call(
        partial(_pair_row_kernel, tile=tile, TW=TW, H=H, W=W,
                n_tiles=n_tiles, k_chunk=k_chunk, CW=CW, NFE=NFE,
                K_cap=K_cap,
                perspective_correct=perspective_correct, eps=eps),
        out_shape=out_shape,
        grid_spec=grid_spec,
        interpret=interpret,
    )(starts, counts, pfv)


@partial(jax.jit, static_argnames=("tile", "TW", "H", "W", "n_tiles",
                                   "k_chunk", "perspective_correct",
                                   "interpret"))
def pallas_rasterize_tiles(tile_fv, tile_valid, tile: int, TW: int, H: int,
                           W: int, n_tiles: int = 0, k_chunk: int = 256,
                           perspective_correct: bool = True,
                           interpret: bool = False, eps: float = 1e-8,
                           tile_counts=None):
    """Rasterize all tiles. tile_fv (T, 9, K) f32 (x0 y0 z0 x1 y1 z1 x2 y2 z2
    per binned face, K lanes); tile_valid (T, 1, K) f32 (1 = real face).
    A multi-camera batch stacks each camera's tiles contiguously on the T axis
    and passes n_tiles = tiles per image (0 = single camera, T tiles).
    tile_counts (T,) int32 = number of valid (contiguous-from-0) faces per
    tile; chunks past the count are skipped in-kernel (scalar prefetch).

    Returns (zbuf, slot, b0, b1), each (T, 1, P) (slot is f32, -1 = empty),
    with P = tile*tile."""
    T, _, K = tile_fv.shape
    if n_tiles <= 0:
        n_tiles = T
    k_chunk = min(k_chunk, K)
    pad = (-K) % k_chunk
    if pad:
        tile_fv = jnp.pad(tile_fv, ((0, 0), (0, 0), (0, pad)))
        tile_valid = jnp.pad(tile_valid, ((0, 0), (0, 0), (0, pad)))
    C = (K + pad) // k_chunk
    P = tile * tile
    if tile_counts is None:
        tile_counts = jnp.sum(tile_valid[:, 0, :] > 0.0,
                              axis=1).astype(jnp.int32)
    out_shape = [
        jax.ShapeDtypeStruct((T, 1, P), jnp.float32),
        jax.ShapeDtypeStruct((T, 1, P), jnp.float32),
        jax.ShapeDtypeStruct((T, 1, P), jnp.float32),
        jax.ShapeDtypeStruct((T, 1, P), jnp.float32),
    ]
    out_spec = pl.BlockSpec((1, 1, P), lambda i, j, cnt: (i, 0, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T, C),
        in_specs=[
            pl.BlockSpec((1, 9, k_chunk), lambda i, j, cnt: (i, 0, j)),
            pl.BlockSpec((1, 1, k_chunk), lambda i, j, cnt: (i, 0, j)),
        ],
        out_specs=[out_spec, out_spec, out_spec, out_spec],
    )
    return pl.pallas_call(
        partial(_tile_kernel, tile=tile, TW=TW, H=H, W=W, n_tiles=n_tiles,
                k_chunk=k_chunk, perspective_correct=perspective_correct,
                eps=eps),
        out_shape=out_shape,
        grid_spec=grid_spec,
        interpret=interpret,
    )(tile_counts, tile_fv, tile_valid)
