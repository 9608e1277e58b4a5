"""Point-cloud transformer primitives (flax.linen).

Rebuilds the reference attention stack (macarons/networks/Attention.py:8-299) the
TPU way: fixed shapes, optional validity masks for padded point sets (the
reference always passes mask=None; masks here subsume its dynamic filtering),
bf16-friendly matmuls, and the reference's layer-type-aware init baked into the
modules (xavier-normal for w_q/w_k/w_v, kaiming-normal elsewhere — reference
scone_utils.py:260-289).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.knn import knn_points

# Reference init scheme (scone_utils.py:277-284)
xavier_normal = nn.initializers.glorot_normal()
kaiming_normal = nn.initializers.variance_scaling(2.0, "fan_in", "normal")


def stats_matched_init(params_tree, reference_tree, key):
    """Re-initialize every kernel as N(mean, std) of the matching layer in a
    previous model — the reference's 'simple initialization process'
    (scone_utils.py:265-288 from_previous_model branch)."""
    import jax

    leaves, treedef = jax.tree_util.tree_flatten(params_tree)
    ref_leaves = jax.tree_util.tree_leaves(reference_tree)
    keys = jax.random.split(key, len(leaves))
    new = []
    for leaf, ref, k in zip(leaves, ref_leaves, keys):
        if leaf.ndim >= 2:  # kernels only; biases keep their init
            mean = jnp.mean(ref)
            std = jnp.std(ref)
            new.append(mean + std * jax.random.normal(k, leaf.shape, leaf.dtype))
        else:
            new.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, new)


def torch_bias_init(key, shape, dtype, fan_in: int):
    """torch nn.Linear default bias init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    import jax

    bound = 1.0 / np.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class Dense(nn.Module):
    """nn.Dense with the reference's init conventions."""

    features: int
    kernel_init: nn.initializers.Initializer = kaiming_normal

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        return nn.Dense(
            self.features,
            kernel_init=self.kernel_init,
            bias_init=lambda k, s, d=jnp.float32: torch_bias_init(k, s, d, fan_in),
        )(x)


def attention(q, k, v, mask: Optional[jnp.ndarray] = None, dtype=jnp.float32):
    """Scaled dot-product attention (reference Attention.py:8-36).

    Keeps the reference's exact op order: scores = q k^T; mask -> -1e3;
    scores /= sqrt(d); softmax; @ v. q/k: (..., N, d), v: (..., N, dv),
    mask broadcastable to (..., N, N) — True/1 = attend.
    """
    scores = jnp.einsum("...nd,...md->...nm", q, k)
    if mask is not None:
        scores = jnp.where(mask == 0, -1e3, scores)
    scores = scores / np.sqrt(q.shape[-1])
    scores = nn.softmax(scores, axis=-1)
    return jnp.einsum("...nm,...md->...nd", scores, v)


class Embedding(nn.Module):
    """Per-point embedding with optional kNN pooling / global feature / input concat.

    Mirrors reference Attention.py:39-128 including its output-dim bookkeeping:
    output features always total `output_dim`, carved into learned features +
    optional global max-pool feature + optional additional feature + optional raw
    input concat.
    """

    input_dim: int
    output_dim: int
    gelu: bool = True
    global_feature: bool = False
    additional_feature_dim: int = 0
    concatenate_input: bool = True
    k_for_knn: int = 0

    @nn.compact
    def __call__(self, x, additional_feature=None, pts_mask=None):
        feature_dim = self.output_dim
        inner_dim = self.output_dim // 2
        if self.additional_feature_dim > 0:
            feature_dim -= self.additional_feature_dim
            inner_dim = feature_dim
        if self.concatenate_input:
            feature_dim -= self.input_dim
            inner_dim = feature_dim
        if self.global_feature:
            feature_dim = feature_dim // 2
            inner_dim = feature_dim

        act = nn.gelu if self.gelu else nn.relu
        res = act(Dense(inner_dim)(x))
        res = Dense(feature_dim)(res)

        if self.k_for_knn > 0:
            # kNN max-pool over spatial neighbors (reference :105-114)
            neigh, _, idx = knn_points(x[..., :3], x[..., :3], self.k_for_knn)
            feats = jnp.take_along_axis(
                res[..., None, :, :],
                idx[..., None],
                axis=-2,
            )  # (..., N, k, F)
            res = jnp.max(feats, axis=-2)

        if self.global_feature:
            if pts_mask is not None:
                masked = jnp.where(pts_mask[..., None], res, -jnp.inf)
            else:
                masked = res
            g = jnp.max(masked, axis=-2, keepdims=True)
            g = jnp.where(jnp.isfinite(g), g, 0.0)  # all-masked guard
            g = jnp.broadcast_to(g, res.shape)
            res = jnp.concatenate((res, g), axis=-1)

        if self.additional_feature_dim > 0:
            res = jnp.concatenate((res, additional_feature), axis=-1)

        if self.concatenate_input:
            res = jnp.concatenate((res, x), axis=-1)

        return res


class MultiHeadSelfAttention(nn.Module):
    """MHSA (reference Attention.py:131-204): separate qk/v dims, out-proj iff >1 head."""

    n_heads: int
    in_dim: int
    qk_dim: int

    @nn.compact
    def __call__(self, x, mask=None):
        v_dim = self.in_dim
        qk_per_head = self.qk_dim // self.n_heads
        v_per_head = v_dim // self.n_heads

        q = Dense(self.qk_dim, kernel_init=xavier_normal)(x)
        k = Dense(self.qk_dim, kernel_init=xavier_normal)(x)
        v = Dense(v_dim, kernel_init=xavier_normal)(x)

        B = x.shape[:-2]
        N = x.shape[-2]
        q = q.reshape(*B, N, self.n_heads, qk_per_head).swapaxes(-2, -3)
        k = k.reshape(*B, N, self.n_heads, qk_per_head).swapaxes(-2, -3)
        v = v.reshape(*B, N, self.n_heads, v_per_head).swapaxes(-2, -3)

        if mask is not None and mask.ndim == len(B) + 2:
            mask = mask[..., None, :, :]
        scores = attention(q, k, v, mask=mask)
        scores = scores.swapaxes(-2, -3).reshape(*B, N, v_dim)

        if self.n_heads > 1:
            scores = Dense(self.in_dim)(scores)
        return scores


class FeedForward(nn.Module):
    """FF unit (reference Attention.py:207-236)."""

    input_dim: int
    inner_dim: int
    gelu: bool = True

    @nn.compact
    def __call__(self, x):
        act = nn.gelu if self.gelu else nn.relu
        return Dense(self.input_dim)(act(Dense(self.inner_dim)(x)))


class Encoder(nn.Module):
    """Pre-norm residual transformer encoder block (reference Attention.py:239-299)."""

    embedding_dim: int
    qk_dim: int
    n_heads: int = 1
    gelu: bool = True
    FF: bool = True

    @nn.compact
    def __call__(self, x, mask=None):
        res = nn.LayerNorm()(x)
        res = MultiHeadSelfAttention(
            n_heads=self.n_heads, in_dim=self.embedding_dim, qk_dim=self.qk_dim
        )(res, mask=mask)
        x = x + res
        if self.FF:
            res2 = nn.LayerNorm()(x)
            res2 = FeedForward(
                input_dim=self.embedding_dim, inner_dim=2 * self.embedding_dim,
                gelu=self.gelu,
            )(res2)
            x = x + res2
        return x


class PCTransformer(nn.Module):
    """Point-cloud global encoder -> pooled feature (reference SconeOcc.py:45-130).

    Embedding -> n_code Encoders -> LayerNorm -> Dense(feature_dim//2) ->
    concat(max-pool, avg-pool) over the sequence -> (B, feature_dim).
    `pts_mask` (B, N) makes the pools padding-aware (TPU fixed-shape extension).
    """

    pts_dim: int = 3
    pts_embedding_dim: int = 256
    feature_dim: int = 512
    concatenate_input: bool = True
    n_code: int = 2
    n_heads: int = 4
    FF: bool = True
    gelu: bool = True

    @nn.compact
    def __call__(self, pc, mask=None, pts_mask=None):
        if mask is None and pts_mask is not None:
            # Key-side attention mask: padded points are never attended to.
            mask = pts_mask[..., None, :]
        x = Embedding(
            input_dim=self.pts_dim,
            output_dim=self.pts_embedding_dim,
            gelu=self.gelu,
            concatenate_input=self.concatenate_input,
        )(pc, pts_mask=pts_mask)
        for _ in range(self.n_code):
            x = Encoder(
                embedding_dim=self.pts_embedding_dim,
                qk_dim=self.pts_embedding_dim // 4,
                n_heads=self.n_heads,
                gelu=self.gelu,
                FF=self.FF,
            )(x, mask=mask)
        x = nn.LayerNorm()(x)
        x = Dense(self.feature_dim // 2)(x)

        if pts_mask is not None:
            neg = jnp.where(pts_mask[..., None], x, -jnp.inf)
            mx = jnp.max(neg, axis=-2)
            mx = jnp.where(jnp.isfinite(mx), mx, 0.0)  # all-masked guard
            denom = jnp.maximum(jnp.sum(pts_mask, axis=-1, keepdims=True), 1)
            av = jnp.sum(
                jnp.where(pts_mask[..., None], x, 0.0), axis=-2
            ) / denom
        else:
            mx = jnp.max(x, axis=-2)
            av = jnp.mean(x, axis=-2)
        return jnp.concatenate((mx, av), axis=-1)
