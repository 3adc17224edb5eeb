"""Sequence block streaming (L1 I/O, SURVEY.md §2 "I/O & misc").

Long sequences are cached as a DIRECTORY of per-chunk npz files plus a
meta.json — written incrementally by resumable generation
(nfs_tpu.sim.smoke.smoke_sequence_cached) and consumed incrementally by
GridStyler.stylize_sequence_blocks. Why not one big npz: (a) this
environment's disk reads at ~15-40 MB/s, so a multi-GB monolithic load
stalls the pipeline for minutes, while per-block reads overlap the
device's async compute; (b) device memory then holds one block instead
of the whole sequence, so sequence length is unbounded.

Layout:
  <cache_dir>/meta.json              {"n_frames": N, "chunk": C}
  <cache_dir>/chunk_00000.npz        {"d": (C, *sp), "v": (C, *sp, nd)}
  <cache_dir>/chunk_00016.npz        (named by start frame)
  ...
"""

from __future__ import annotations

import glob
import json
import os
from typing import Iterator, Optional, Tuple

import numpy as np


def sequence_cache_complete(path: str) -> bool:
    """True if `path` is a complete sequence cache: a legacy single .npz
    or a chunk directory with meta.json."""
    if os.path.isfile(path):
        return True
    return os.path.isfile(os.path.join(path, "meta.json"))


def finalize_sequence_dir(part_dir: str, n_frames: int, chunk: int
                          ) -> None:
    """Mark a chunk directory as a complete cache (writes meta.json;
    chunk files stay as-is — no concatenation pass)."""
    meta = {"n_frames": int(n_frames), "chunk": int(chunk)}
    tmp = os.path.join(part_dir, "meta_tmp.json")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(part_dir, "meta.json"))


def _chunk_paths(cache_dir: str):
    import re

    # digits only: never pick up tmp/garbage files from interrupted runs
    pat = re.compile(r"chunk_\d+\.npz$")
    return sorted(p for p in glob.glob(
        os.path.join(cache_dir, "chunk_*.npz")) if pat.search(p))


def load_sequence_cache(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """Load a full sequence into host memory (legacy npz or chunk dir)."""
    if os.path.isfile(path):
        with np.load(path) as z:
            return np.asarray(z["d"]), np.asarray(z["v"])
    ds, vs = [], []
    for c in _chunk_paths(path):
        with np.load(c) as z:
            ds.append(np.asarray(z["d"]))
            vs.append(np.asarray(z["v"]))
    return np.concatenate(ds), np.concatenate(vs)


def iter_sequence_blocks(path: str, halo: int,
                         n_frames: Optional[int] = None
                         ) -> Iterator[Tuple[int, np.ndarray, np.ndarray]]:
    """Yield (t0, dens_block, vels_ctx) blocks for
    GridStyler.stylize_sequence_blocks.

    vels_ctx covers global frames [t0 - P, t0 + B + P) with
    P = max(halo, 1); at the true sequence boundaries the edge velocity
    frame is replicated — matching the clamped neighbor indexing of the
    in-memory sequence stylizer.

    A one-chunk lookahead is kept so each block's right halo comes from
    the next chunk without re-reading files.
    """
    P = max(int(halo), 1)
    if os.path.isfile(path):  # legacy single npz: one big block
        with np.load(path) as z:
            ds, vs = np.asarray(z["d"]), np.asarray(z["v"])
        if n_frames is not None:
            ds, vs = ds[:n_frames], vs[:n_frames]
        ctx = np.concatenate([np.repeat(vs[:1], P, axis=0), vs,
                              np.repeat(vs[-1:], P, axis=0)])
        yield 0, ds, ctx
        return

    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    total = meta["n_frames"] if n_frames is None else min(
        n_frames, meta["n_frames"])
    paths = _chunk_paths(path)

    def read(i):
        with np.load(paths[i]) as z:
            return np.asarray(z["d"]), np.asarray(z["v"])

    t0 = 0
    prev_v_tail = None
    cur = read(0)
    for i in range(len(paths)):
        if t0 >= total:
            break
        d, v = cur
        nxt = read(i + 1) if i + 1 < len(paths) else None
        take = min(d.shape[0], total - t0)
        d, v = d[:take], v[:take]
        left = (prev_v_tail if prev_v_tail is not None
                else np.repeat(v[:1], P, axis=0))
        if nxt is not None and t0 + take < total:
            right = nxt[1][:P]
            if right.shape[0] < P:
                right = np.concatenate(
                    [right, np.repeat(right[-1:], P - right.shape[0],
                                      axis=0)])
        else:
            right = np.repeat(v[-1:], P, axis=0)
        yield t0, d, np.concatenate([left, v, right])
        prev_v_tail = v[-P:]
        if prev_v_tail.shape[0] < P:
            prev_v_tail = np.concatenate(
                [np.repeat(prev_v_tail[:1], P - prev_v_tail.shape[0],
                           axis=0), prev_v_tail])
        t0 += take
        cur = nxt
