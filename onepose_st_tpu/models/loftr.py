"""Detector-free 2D-2D dense matcher (LoFTR-style) for SfM and detection.

Re-design of the reference's LoFTR submodule + wrapper
(src/KeypointFreeSfM/loftr_for_sfm/loftr.py:16-167, config
utils/loftr_for_onepose_plus_cfg.py: 4x(self,cross) linear attention,
dual-softmax T=0.1 thr=0.2, fine window 9). Three entry modes:

  * full matching:    coarse + fine on top-K extracted matches
  * fine-only bypass: caller supplies coarse (i, j) grid ids — used by the
    SfM refinement pass (reference loftr.py:79-115)
  * feature sampling is *not* in the module — use ops.sampling on the
    returned feature maps (reference loftr.py:130-167 equivalent).

Shares building blocks with the 2D-3D matcher; both images run through the
backbone as one batched call (TPU likes one big conv batch).
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import LoFTRConfig
from ..ops import matching as match_ops
from ..ops import pallas_kernels as fused_ops
from ..ops import windows as window_ops
from .backbone import ResNetFPN
from .encodings import sine_positional_encoding
from .transformer import LocalFeatureTransformer


class LoFTRMatcher(nn.Module):
    cfg: LoFTRConfig

    def setup(self):
        c = self.cfg
        self.backbone = ResNetFPN(c.backbone)
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

    def extract_features(self, images: jax.Array, train: bool = False):
        """Backbone only: [N, H, W, 1] -> (coarse [N,Hc,Wc,Cc], fine)."""
        return self.backbone(images, train=train)

    def coarse(
        self,
        image0: jax.Array,  # [B, H, W, 1]
        image1: jax.Array,  # [B, H, W, 1] (same static size)
        train: bool = False,
        dense_conf: bool = False,
    ) -> dict[str, Any]:
        """Backbone + coarse transformer + dual-softmax match extraction."""
        c = self.cfg
        B, H, W, _ = image0.shape
        Hc, Wc = H // c.backbone.coarse_stride, W // c.backbone.coarse_stride
        S = Hc * Wc

        # 1. shared backbone over both images in one batch
        feat_c, feat_f = self.backbone(
            jnp.concatenate([image0, image1], axis=0), train=train
        )
        fc0, fc1 = feat_c[:B], feat_c[B:]
        ff0, ff1 = feat_f[:B], feat_f[B:]

        # 2. coarse transformer
        t0 = sine_positional_encoding(fc0, c.pe_variant).reshape(B, S, -1)
        t1 = sine_positional_encoding(fc1, c.pe_variant).reshape(B, S, -1)
        t0, t1 = self.loftr_coarse(t0, t1)

        # 3. dual-softmax + mutual-NN extraction (border-masked on both grids)
        border = match_ops.grid_border_mask((Hc, Wc), c.coarse_matching.border_rm)
        if train or dense_conf:
            conf = match_ops.dual_softmax(
                t0, t1, temperature=c.coarse_matching.temperature
            )
            matches = match_ops.extract_matches(
                conf,
                threshold=c.coarse_matching.threshold,
                max_matches=c.coarse_matching.max_matches,
                border_mask_rows=border,
                border_mask_cols=border,
            )
        else:
            conf = None
            # row border mask rides the kernel's point mask
            matches = fused_ops.extract_matches_fused(
                t0,
                t1,
                temperature=c.coarse_matching.temperature,
                threshold=c.coarse_matching.threshold,
                max_matches=c.coarse_matching.max_matches,
                point_mask=jnp.broadcast_to(border[None], (B, S)),
                border_mask_cols=border,
            )
        return {
            "conf_matrix": conf,
            "matches": matches,
            "feat_c0": fc0,
            "feat_c1": fc1,
            "feat_f0": ff0,
            "feat_f1": ff1,
            "coarse_hw": (Hc, Wc),
        }

    def fine(
        self,
        feat_f0: jax.Array,            # [B, Hf, Wf, Cf] from coarse()
        feat_f1: jax.Array,
        i_ids: jax.Array,              # [B, K] grid-0 cells
        j_ids: jax.Array,              # [B, K] grid-1 cells
        coarse_hw: tuple[int, int],
    ) -> dict[str, Any]:
        """Fine refinement: center descriptor of window0 vs window1 heatmap."""
        c = self.cfg
        B, K = i_ids.shape
        Hc, Wc = coarse_hw
        Wn = c.fine.window_size
        win0 = window_ops.gather_windows(feat_f0, i_ids, (Hc, Wc), Wn)
        win1 = window_ops.gather_windows(feat_f1, j_ids, (Hc, Wc), Wn)
        w0 = win0.reshape(B * K, Wn * Wn, -1)
        w1 = win1.reshape(B * K, Wn * Wn, -1)
        w0, w1 = self.loftr_fine(w0, w1)
        Cf = w0.shape[-1]
        center = w0[:, Wn * Wn // 2].astype(jnp.float32)       # [BK, Cf]
        sim = jnp.einsum("mc,mrc->mr", center, w1.astype(jnp.float32)) / (Cf**0.5)
        heatmap = jax.nn.softmax(sim, axis=-1).reshape(B * K, Wn, Wn)
        coords_normed, std = match_ops.spatial_expectation(heatmap)
        coords_normed = coords_normed.reshape(B, K, 2)
        std = std.reshape(B, K)

        stride_c = float(c.backbone.coarse_stride)
        stride_f = float(c.backbone.fine_stride)
        mkpts0_c = match_ops.grid_coords(i_ids, Wc, stride_c)
        mkpts1_c = match_ops.grid_coords(j_ids, Wc, stride_c)
        mkpts1_f = mkpts1_c + coords_normed * (Wn // 2) * stride_f
        return {
            "mkpts0_c": mkpts0_c,
            "mkpts1_c": mkpts1_c,
            "mkpts1_f": mkpts1_f,
            "expec_f": jnp.concatenate([coords_normed, std[..., None]], axis=-1),
        }

    def __call__(
        self,
        image0: jax.Array,  # [B, H, W, 1]
        image1: jax.Array,  # [B, H, W, 1] (same static size)
        fine_ids: tuple[jax.Array, jax.Array] | None = None,
        train: bool = False,
        dense_conf: bool = False,
    ) -> dict[str, Any]:
        out = self.coarse(image0, image1, train=train, dense_conf=dense_conf)
        matches = out.pop("matches")
        if fine_ids is not None:
            i_ids, j_ids = fine_ids
            valid = jnp.ones(i_ids.shape, dtype=bool)
            conf_out = jnp.ones(i_ids.shape, dtype=jnp.float32)
        else:
            i_ids, j_ids = matches.i_ids, matches.j_ids
            valid = matches.valid
            conf_out = matches.conf
        fine_out = self.fine(
            out["feat_f0"], out["feat_f1"], i_ids, j_ids, out["coarse_hw"]
        )
        return {
            **out,
            **fine_out,
            "i_ids": i_ids,
            "j_ids": j_ids,
            "valid": valid,
            "mconf": conf_out,
        }
