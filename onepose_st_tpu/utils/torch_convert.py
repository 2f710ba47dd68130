"""PyTorch state_dict -> flax parameter conversion utilities.

The reference ships torch checkpoints (LoFTR wsize9, OnePose++ matcher,
DenseNet calibration; loaded with prefix surgery at e.g.
src/inference/inference_OnePosePlus.py:34-38). This module provides the
numerically-exact primitive mappings (conv OIHW->HWIO, linear transpose,
BatchNorm running stats -> batch_stats collection) plus a rule-driven
state-dict walker, so a user migrating from the reference can carry weights
over where module shapes line up. The framework's models are re-designs —
full-model transfer additionally needs a per-checkpoint rule table mapping
the reference's module tree onto ours.

No torch import at module load: torch is only needed inside the functions.
"""
from __future__ import annotations

import re
from typing import Callable

import numpy as np


def conv_kernel(w) -> np.ndarray:
    """torch Conv2d weight [O, I, kh, kw] -> flax Conv kernel [kh, kw, I, O]."""
    return np.ascontiguousarray(np.transpose(np.asarray(w), (2, 3, 1, 0)))


def dense_kernel(w) -> np.ndarray:
    """torch Linear weight [O, I] -> flax Dense kernel [I, O]."""
    return np.ascontiguousarray(np.asarray(w).T)


def batchnorm(prefix: str, sd: dict) -> tuple[dict, dict]:
    """torch BN buffers -> (params {scale, bias}, batch_stats {mean, var})."""
    return (
        {
            "scale": np.asarray(sd[f"{prefix}.weight"]),
            "bias": np.asarray(sd[f"{prefix}.bias"]),
        },
        {
            "mean": np.asarray(sd[f"{prefix}.running_mean"]),
            "var": np.asarray(sd[f"{prefix}.running_var"]),
        },
    )


def strip_prefix(sd: dict, prefix: str) -> dict:
    """Checkpoint prefix surgery (reference model_io.py / `matcher.` strip)."""
    out = {}
    for k, v in sd.items():
        if k.startswith(prefix):
            out[k[len(prefix):]] = v
    return out


ConvertRule = tuple[str, Callable[[re.Match, dict], dict]]


def convert_state_dict(
    sd: dict, rules: list[ConvertRule]
) -> tuple[dict, dict]:
    """Walk a torch state_dict applying (regex -> emitter) rules.

    Each emitter returns {flax_path_tuple: array} entries; paths ending in
    ('batch_stats', ...) go to the batch_stats collection, everything else
    to params. Unmatched torch keys are collected and reported so silent
    partial conversion cannot happen.
    """
    params: dict = {}
    stats: dict = {}
    unmatched = []
    consumed: set[str] = set()
    for key in sd:
        if key in consumed:
            continue
        hit = False
        for pattern, emit in rules:
            m = re.fullmatch(pattern, key)
            if m is None:
                continue
            for path, value in emit(m, sd).items():
                tgt = stats if path[0] == "batch_stats" else params
                node = tgt
                rel = path[1:] if path[0] == "batch_stats" else path
                for p in rel[:-1]:
                    node = node.setdefault(p, {})
                node[rel[-1]] = value
            # a BN rule consumes its sibling buffers
            base = key.rsplit(".", 1)[0]
            for suffix in (
                "weight", "bias", "running_mean", "running_var",
                "num_batches_tracked",
            ):
                sib = f"{base}.{suffix}"
                if sib in sd and pattern.endswith("(weight|bias|running_mean|running_var|num_batches_tracked)"):
                    consumed.add(sib)
            hit = True
            break
        if not hit:
            unmatched.append(key)
    if unmatched:
        raise KeyError(
            f"{len(unmatched)} torch keys had no conversion rule, e.g. "
            f"{unmatched[:5]}"
        )
    return params, stats


def load_torch_checkpoint(path, map_key: str | None = "state_dict") -> dict:
    """Load a torch .ckpt/.tar/.pth into a flat numpy state_dict."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if map_key and isinstance(obj, dict) and map_key in obj:
        obj = obj[map_key]
    return {k: v.numpy() if hasattr(v, "numpy") else v for k, v in obj.items()}
