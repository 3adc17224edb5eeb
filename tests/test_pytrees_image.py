"""Coverage for the pytree containers and image/video export."""

import os

import numpy as np
import jax
import jax.numpy as jnp

from nfs_tpu.core.pytrees import ParticleSet
from nfs_tpu.io.image import save_image, save_video


class TestPytrees:
    def test_particle_set_optional_fields(self):
        p = ParticleSet(x=jnp.zeros((7, 2)))
        assert p.n == 7 and p.dim == 2
        assert p.dens is None and p.color is None
        # optional leaves don't break tree ops
        p2 = jax.tree_util.tree_map(lambda x: x + 1, p)
        assert float(p2.x[0, 0]) == 1.0


class TestVideoExport:
    def test_save_video_writes_output(self, tmp_path):
        frames = [np.random.default_rng(i).random((16, 16, 3))
                  for i in range(4)]
        path = str(tmp_path / "out.mp4")
        save_video(path, frames, fps=8)
        # imageio path writes the file; fallback writes a PNG sequence
        wrote_video = os.path.exists(path)
        wrote_seq = os.path.exists(str(tmp_path / "out_0000.png"))
        assert wrote_video or wrote_seq

    def test_save_image_grayscale(self, tmp_path):
        path = str(tmp_path / "g.png")
        save_image(path, np.random.default_rng(0).random((8, 8)))
        assert os.path.exists(path) or os.path.exists(path + ".npy")
