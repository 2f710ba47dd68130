"""OnePose++ style 2D-3D attention matcher (flax, static shapes).

Re-design of reference src/models/OnePosePlus/OnePosePlusModel.py:95-203:
query image features (ResNet-FPN + sine PE) attend against a padded 3D point
cloud's descriptors (coarse 256-d + keypoint MLP encoding) through
`layer_iter_n` (self, cross) linear-attention blocks; dual-softmax coarse
matching; 5x5 fine windows refined by one more (self, cross) block and a
softmax-expectation sub-pixel head.

All shapes are static: the point cloud is padded to cfg.n_points with a
validity mask, and matches come out as fixed-capacity top-K sets
(ops.matching.extract_matches) instead of torch.where lists.

The coarse and fine stages are separate methods so the training step can
run coarse once, choose its own fine slots (predicted ++ GT pads), and run
fine once — no double forward.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import MatcherConfig
from ..core import camera
from ..ops import matching as match_ops
from ..ops import pallas_kernels as fused_ops
from ..ops import windows as window_ops
from .backbone import ResNetFPN
from .encodings import KeypointEncoding, sine_positional_encoding
from .transformer import LocalFeatureTransformer


class OnePoseMatcher(nn.Module):
    cfg: MatcherConfig

    def setup(self):
        c = self.cfg
        self.backbone = ResNetFPN(c.backbone)
        self.kpt_encoding = KeypointEncoding(
            c.kpt_encoding, dtype=jnp.dtype(c.coarse.dtype)
        )
        self.loftr_coarse = LocalFeatureTransformer(
            d_model=c.coarse.d_model,
            nhead=c.coarse.nhead,
            layer_iter_n=c.coarse.layer_iter_n,
            attention=c.coarse.attention,
            dtype=jnp.dtype(c.coarse.dtype),
        )
        self.loftr_fine = LocalFeatureTransformer(
            d_model=c.fine.d_model,
            nhead=c.fine.nhead,
            layer_iter_n=c.fine.layer_iter_n,
            attention=c.fine.attention,
            dtype=jnp.dtype(c.fine.dtype),
        )

    def coarse_tokens(
        self,
        query_image: jax.Array,        # [B, H, W, 1] grayscale
        kpts3d: jax.Array,             # [B, L, 3] padded cloud
        desc3d_coarse: jax.Array,      # [B, L, Cc]
        kpts3d_mask: jax.Array | None = None,
        train: bool = False,
        img_mask: jax.Array | None = None,
    ):
        """Backbone + encodings + coarse transformer, up to (but excluding)
        matching. Returns (q_tokens [B,S,C], p_tokens [B,L,C], feat_f,
        (Hc, Wc)) — the seam used by the training profiler and fused-loss
        paths to isolate the matching/loss segment."""
        c = self.cfg
        B, H, W, _ = query_image.shape
        Hc, Wc = H // c.backbone.coarse_stride, W // c.backbone.coarse_stride
        S = Hc * Wc

        feat_c, feat_f = self.backbone(query_image, train=train)
        q_tokens = sine_positional_encoding(feat_c, c.pe_variant).reshape(B, S, -1)
        kpts_normed = camera.normalize_3d_keypoints(kpts3d, kpts3d_mask)
        p_tokens = self.kpt_encoding(
            kpts_normed, desc3d_coarse.astype(q_tokens.dtype)
        )
        if kpts3d_mask is not None:
            p_tokens = p_tokens * kpts3d_mask[..., None].astype(p_tokens.dtype)
        if img_mask is not None:
            q_tokens = q_tokens * img_mask[..., None].astype(q_tokens.dtype)

        q_tokens, p_tokens = self.loftr_coarse(
            q_tokens, p_tokens, mask0=img_mask, mask1=kpts3d_mask
        )
        return q_tokens, p_tokens, feat_f, (Hc, Wc)

    def coarse(
        self,
        query_image: jax.Array,        # [B, H, W, 1] grayscale
        kpts3d: jax.Array,             # [B, L, 3] padded cloud
        desc3d_coarse: jax.Array,      # [B, L, Cc]
        kpts3d_mask: jax.Array | None = None,   # [B, L] bool (True = real)
        train: bool = False,
        dense_conf: bool = False,
        img_mask: jax.Array | None = None,      # [B, Hc*Wc] bool (True = real
                                                # source pixels behind the cell)
    ) -> dict[str, Any]:
        """`img_mask` marks coarse-grid cells backed by real source pixels:
        detector crops of a truncated object contain black warp-fill past
        the frame edge, and those dead cells must not produce matches.

        The mask acts as a MATCH FILTER + supervision gate only — it is
        deliberately NOT applied inside attention or the dual-softmax
        normalization: most inference crops are fully valid, so a model
        trained with masked attention on jittered crops would see a
        token-statistics distribution it never meets at test time
        (measured: full masking cost 0.06 AP on the wild loop vs
        filter-only, logs/ffe_r4a.log vs r3h)."""
        c = self.cfg
        q_tokens, p_tokens, feat_f, (Hc, Wc) = self.coarse_tokens(
            query_image, kpts3d, desc3d_coarse, kpts3d_mask, train
        )
        border = match_ops.grid_border_mask((Hc, Wc), c.coarse_matching.border_rm)
        if train or dense_conf:
            # training needs the dense conf matrix (focal loss) and autodiff
            conf = match_ops.dual_softmax(
                p_tokens,
                q_tokens,
                temperature=c.coarse_matching.temperature,
                mask0=kpts3d_mask,
            )
            matches = match_ops.extract_matches(
                conf,
                threshold=c.coarse_matching.threshold,
                max_matches=c.coarse_matching.max_matches,
                border_mask_cols=border,
                col_mask=img_mask,
            )
        else:
            # inference: fused Pallas scoring, conf never materialized
            conf = None
            matches = fused_ops.extract_matches_fused(
                p_tokens,
                q_tokens,
                temperature=c.coarse_matching.temperature,
                threshold=c.coarse_matching.threshold,
                max_matches=c.coarse_matching.max_matches,
                point_mask=kpts3d_mask,
                border_mask_cols=border,
                col_mask=img_mask,
            )
        return {
            "conf_matrix": conf,
            "matches": matches,
            "feat_f": feat_f,
            "coarse_hw": (Hc, Wc),
        }

    def fine(
        self,
        feat_f: jax.Array,             # [B, Hf, Wf, Cf] from coarse()
        desc3d_fine: jax.Array,        # [B, L, Cf]
        i_ids: jax.Array,              # [B, K]
        j_ids: jax.Array,              # [B, K]
        coarse_hw: tuple[int, int],
    ) -> dict[str, Any]:
        c = self.cfg
        B, K = i_ids.shape
        Hc, Wc = coarse_hw
        Wn = c.fine.window_size

        win = window_ops.gather_windows(feat_f, j_ids, (Hc, Wc), Wn)
        d3f = jnp.take_along_axis(
            desc3d_fine.astype(win.dtype), i_ids[..., None], axis=1
        )
        win_flat = win.reshape(B * K, Wn * Wn, -1)
        d3f_flat = d3f.reshape(B * K, 1, -1)
        win_flat, d3f_flat = self.loftr_fine(win_flat, d3f_flat)

        Cf = win_flat.shape[-1]
        sim = jnp.einsum(
            "mc,mrc->mr",
            d3f_flat[:, 0].astype(jnp.float32),
            win_flat.astype(jnp.float32),
        ) / (Cf**0.5)
        heatmap = jax.nn.softmax(sim, axis=-1).reshape(B * K, Wn, Wn)
        coords_normed, std = match_ops.spatial_expectation(heatmap)
        coords_normed = coords_normed.reshape(B, K, 2)
        std = std.reshape(B, K)

        stride_c = float(c.backbone.coarse_stride)
        stride_f = float(c.backbone.fine_stride)
        mkpts_c = match_ops.grid_coords(j_ids, Wc, stride_c)
        mkpts_f = mkpts_c + coords_normed * (Wn // 2) * stride_f
        return {
            "mkpts_query_c": mkpts_c,
            "mkpts_query_f": mkpts_f,
            "expec_f": jnp.concatenate([coords_normed, std[..., None]], axis=-1),
        }

    def __call__(
        self,
        query_image: jax.Array,
        kpts3d: jax.Array,
        desc3d_coarse: jax.Array,
        desc3d_fine: jax.Array,
        kpts3d_mask: jax.Array | None = None,
        fine_ids: tuple[jax.Array, jax.Array] | None = None,
        train: bool = False,
        dense_conf: bool = False,
        img_mask: jax.Array | None = None,
    ) -> dict[str, Any]:
        out = self.coarse(
            query_image, kpts3d, desc3d_coarse, kpts3d_mask, train, dense_conf,
            img_mask=img_mask,
        )
        if fine_ids is not None:
            i_ids, j_ids = fine_ids
        else:
            i_ids, j_ids = out["matches"].i_ids, out["matches"].j_ids
        fine_out = self.fine(
            out["feat_f"], desc3d_fine, i_ids, j_ids, out["coarse_hw"]
        )
        mkpts3d = jnp.take_along_axis(kpts3d, i_ids[..., None], axis=1)
        return {
            **out,
            **fine_out,
            "i_ids": i_ids,
            "j_ids": j_ids,
            "mkpts3d": mkpts3d,
        }
