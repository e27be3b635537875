"""Weight-file IO shared by the model families.

Two on-disk formats:

- ``.pth`` — the public torch checkpoints; parsed by each model's
  ``load_torch_weights`` (requires torch, tooling-only — like the
  reference's convert2onnx stage).
- ``.npz`` — the flattened pytree written by ``cli convert-weights``;
  loads with numpy alone, so converted checkpoints run in environments
  without torch (the TensorRT-engine analogue: convert once, deploy
  everywhere).
"""

from __future__ import annotations

import numpy as np

__all__ = ["save_npz_pytree", "load_npz_pytree", "load_weights"]


def flatten_pytree(params) -> dict:
    """Nested dict/list pytree → {"a/b/0/w": ndarray} flat dict."""
    flat = {}

    def rec(prefix, obj):
        if isinstance(obj, dict):
            for k, v in obj.items():
                rec(f"{prefix}/{k}" if prefix else k, v)
        elif isinstance(obj, (list, tuple)):
            for i, v in enumerate(obj):
                rec(f"{prefix}/{i}", v)
        else:
            flat[prefix] = np.asarray(obj)

    rec("", params)
    return flat


def save_npz_pytree(path: str, params) -> int:
    flat = flatten_pytree(params)
    np.savez_compressed(path, **flat)
    return len(flat)


def load_npz_pytree(path: str):
    """Inverse of :func:`save_npz_pytree`: rebuild the nested pytree,
    turning integer path components back into list indices."""
    import jax.numpy as jnp

    data = np.load(path)
    root: dict = {}
    for key in data.files:
        parts = key.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(data[key])

    def listify(node):
        if not isinstance(node, dict):
            return node
        keys = list(node.keys())
        if keys and all(k.isdigit() for k in keys):
            return [listify(node[str(i)]) for i in range(len(keys))]
        return {k: listify(v) for k, v in node.items()}

    return listify(root)


def load_weights(path: str, torch_loader, *args):
    """Dispatch on extension: .npz → numpy pytree, else torch loader."""
    if str(path).endswith(".npz"):
        return load_npz_pytree(path)
    return torch_loader(path, *args)
