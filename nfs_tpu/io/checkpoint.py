"""In-frame checkpoint / resume (SURVEY.md §5: the reference's only
checkpoint is the per-frame output file — Adam moments die with the
process. Rebuild prescription: checkpoint {opt-field, Adam state, octave
index, PRNG key} every N iterations + a sequence-level manifest).

Storage: a single .npz per checkpoint. Pytrees are flattened with
jax.tree_util key paths, so any dict/tuple/dataclass nesting of arrays
round-trips without pickle. Writes are atomic (tmp + rename) so a crash
mid-write leaves the previous checkpoint intact.
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


def _key_str(path) -> str:
    out = []
    for k in path:
        if hasattr(k, "key"):
            out.append(str(k.key))
        elif hasattr(k, "idx"):
            out.append(str(k.idx))
        elif hasattr(k, "name"):
            out.append(str(k.name))
        else:
            out.append(str(k))
    return "/".join(out)


def save_checkpoint(path: str, tree: Any, meta: Optional[Dict] = None
                    ) -> None:
    """Atomically save a pytree of arrays (+ JSON-able metadata)."""
    leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
    arrays = {}
    for p, leaf in leaves:
        arrays["leaf:" + _key_str(p)] = np.asarray(leaf)
    if meta is not None:
        arrays["__meta__"] = np.frombuffer(
            json.dumps(meta).encode(), dtype=np.uint8)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path) or ".",
                               suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, **arrays)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def load_checkpoint(path: str, like: Any) -> Tuple[Any, Optional[Dict]]:
    """Load a checkpoint into the structure of `like` (a pytree with the
    same treedef, e.g. freshly-initialized state). Returns (tree, meta)."""
    with np.load(path) as npz:
        meta = None
        if "__meta__" in npz.files:
            meta = json.loads(bytes(npz["__meta__"]).decode())
        paths_like = jax.tree_util.tree_flatten_with_path(like)
        leaves = []
        for p, leaf in paths_like[0]:
            key = "leaf:" + _key_str(p)
            if key not in npz.files:
                raise KeyError(f"checkpoint {path} missing leaf {key}")
            arr = npz[key]
            if hasattr(leaf, "dtype") and arr.dtype != leaf.dtype:
                arr = arr.astype(leaf.dtype)
            leaves.append(
                jax.numpy.asarray(arr) if hasattr(leaf, "devices")
                else arr)
        tree = jax.tree_util.tree_unflatten(paths_like[1], leaves)
    return tree, meta


class SequenceManifest:
    """Frame-granular resume bookkeeping for sequence jobs (SURVEY.md §5):
    a JSON file mapping frame index -> output path + status."""

    def __init__(self, path: str):
        self.path = path
        self.state: Dict[str, Dict] = {}
        if os.path.exists(path):
            with open(path) as f:
                self.state = json.load(f)

    def done(self, frame: int) -> bool:
        ent = self.state.get(str(frame))
        return bool(ent and ent.get("status") == "done"
                    and os.path.exists(ent.get("output", "")))

    def mark(self, frame: int, output: str, status: str = "done",
             **extra) -> None:
        self.state[str(frame)] = {"output": output, "status": status,
                                  **extra}
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self.state, f, indent=1)
        os.replace(tmp, self.path)
