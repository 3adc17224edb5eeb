"""I/O: .npz frame store, mantaflow .uni codec, image/video export
(reference: ``util.py``, SURVEY.md §2 "I/O & misc")."""

from nfs_tpu.io.npz import FrameStore, load_frame, save_frame
from nfs_tpu.io.uni import read_uni, write_uni
from nfs_tpu.io.image import load_image, save_image, save_video

__all__ = [
    "FrameStore",
    "load_frame",
    "save_frame",
    "read_uni",
    "write_uni",
    "load_image",
    "save_image",
    "save_video",
]
