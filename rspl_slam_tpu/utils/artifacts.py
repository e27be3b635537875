"""Pretrained-checkpoint and dataset autodetection.

The three public model checkpoints the reference converts to TensorRT
engines (convert2onnx/convert_superpoint_to_onnx.py:18-60 `weights/
superpoint_v1.pth`, convert_superglue_to_onnx.py:25-88 `weights/
superglue_outdoor.pth`, and the RCF BSDS+PASCAL checkpoint rcf.h:48) are
not shipped in every environment. This module finds them — plus an
EuRoC/OIVIO dataset root — in standard locations, so the moment the
artifacts appear, `bench.py` and drivers pick them up with zero code
change (the trained-weights measured loop + ATE run turn on
automatically).

Search order (first hit wins):
1. explicit per-model env vars ``RSPL_SUPERPOINT_WEIGHTS`` /
   ``RSPL_SUPERGLUE_WEIGHTS`` / ``RSPL_RCF_WEIGHTS``;
2. ``$RSPL_WEIGHTS_DIR``, then ``/root/weights``, ``<repo>/weights``,
   ``~/weights`` — scanned for the conventional filenames below.

Dataset root: ``$RSPL_DATA_DIR``, then ``/root/data``, ``/root/datasets``,
``~/data`` — any directory that `datasets.open_dataset` recognizes
(EuRoC ``mav0/`` layout or plain left/right image dirs), searched two
levels deep.
"""

from __future__ import annotations

import os

__all__ = ["find_pretrained", "find_dataset_root", "WEIGHT_FILENAMES"]

WEIGHT_FILENAMES = {
    # conventional public checkpoint names, most specific first
    "superpoint": ("superpoint_v1.pth", "superpoint.pth",
                   "superpoint_v1.npz", "superpoint.npz"),
    "superglue": ("superglue_outdoor.pth", "superglue_indoor.pth",
                  "superglue.pth", "superglue_outdoor.npz",
                  "superglue.npz"),
    "rcf": ("bsds500_pascal_model.pth", "RCF-pytorch.pth", "rcf.pth",
            "rcf.npz"),
}

_ENV_VARS = {
    "superpoint": "RSPL_SUPERPOINT_WEIGHTS",
    "superglue": "RSPL_SUPERGLUE_WEIGHTS",
    "rcf": "RSPL_RCF_WEIGHTS",
}


def _weight_dirs(extra_dirs=()):
    dirs = list(extra_dirs)
    if os.environ.get("RSPL_WEIGHTS_DIR"):
        dirs.append(os.environ["RSPL_WEIGHTS_DIR"])
    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    dirs += ["/root/weights", os.path.join(repo, "weights"),
             os.path.expanduser("~/weights")]
    return dirs


def find_pretrained(extra_dirs=()) -> dict:
    """{"superpoint": path, "superglue": path, "rcf": path} for every model
    whose checkpoint was found; missing models are simply absent. Explicit
    env vars win over directory scans."""
    found = {}
    for model, env in _ENV_VARS.items():
        p = os.environ.get(env)
        if p and os.path.isfile(p):
            found[model] = p
    for d in _weight_dirs(extra_dirs):
        if not os.path.isdir(d):
            continue
        for model, names in WEIGHT_FILENAMES.items():
            if model in found:
                continue
            for name in names:
                p = os.path.join(d, name)
                if os.path.isfile(p):
                    found[model] = p
                    break
    return found


def _is_dataset(path: str) -> bool:
    from rspl_slam_tpu.datasets import open_dataset

    try:
        ds = open_dataset(path)
        return len(ds) > 0
    except Exception:
        return False


def find_dataset_root(extra_dirs=()) -> str | None:
    """First directory (searched two levels deep under the standard roots)
    that `datasets.open_dataset` can open with ≥1 frame, or None."""
    roots = list(extra_dirs)
    if os.environ.get("RSPL_DATA_DIR"):
        roots.append(os.environ["RSPL_DATA_DIR"])
    roots += ["/root/data", "/root/datasets", os.path.expanduser("~/data")]
    for root in roots:
        if not os.path.isdir(root):
            continue
        if _is_dataset(root):
            return root
        for sub in sorted(os.listdir(root)):
            p = os.path.join(root, sub)
            if not os.path.isdir(p):
                continue
            if _is_dataset(p):
                return p
            for sub2 in sorted(os.listdir(p)):
                q = os.path.join(p, sub2)
                if os.path.isdir(q) and _is_dataset(q):
                    return q
    return None
