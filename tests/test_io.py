"""Round-trip tests for the npz frame store and the .uni codec
(SURVEY.md §4: ".uni codec round-trip vs hand-built byte fixtures")."""

import gzip
import struct

import numpy as np
import pytest

from nfs_tpu.io import FrameStore, load_frame, save_frame
from nfs_tpu.io.uni import (
    read_uni, write_uni, read_uni_particles, write_uni_particles,
)


class TestNpz:
    def test_roundtrip(self, tmp_path):
        d = np.random.default_rng(0).random((8, 9, 10)).astype(np.float32)
        path = str(tmp_path / "d_0000.npz")
        save_frame(path, d)
        out = load_frame(path)
        np.testing.assert_array_equal(out, d)

    def test_manta_velocity_channel_flip(self, tmp_path):
        v = np.random.default_rng(1).random((4, 5, 6, 3)).astype(np.float32)
        path = str(tmp_path / "v_0000.npz")
        save_frame(path, v)  # stored as-is (mantaflow order on disk)
        out = load_frame(path, manta_order=True)
        np.testing.assert_array_equal(out, v[..., ::-1])

    def test_framestore(self, tmp_path):
        store = FrameStore(str(tmp_path))
        d = np.random.default_rng(2).random((6, 6)).astype(np.float32)
        store.save_density(3, d)
        assert store.exists(store.d_path, 3)
        assert not store.exists(store.d_path, 4)
        np.testing.assert_array_equal(store.load_density(3), d)

    def test_framestore_particles(self, tmp_path):
        store = FrameStore(str(tmp_path))
        x = np.random.default_rng(3).random((50, 3)).astype(np.float32)
        dens = np.ones(50, np.float32)
        store.save_particles(0, x=x, dens=dens)
        out = store.load_particles(0)
        np.testing.assert_array_equal(out["x"], x)
        np.testing.assert_array_equal(out["dens"], dens)


class TestUni:
    def test_scalar_roundtrip(self, tmp_path):
        d = np.random.default_rng(4).random((5, 6, 7)).astype(np.float32)
        path = str(tmp_path / "d.uni")
        write_uni(path, d)
        out, header = read_uni(path)
        np.testing.assert_array_equal(out, d)
        assert header.magic == "MNT3"
        assert header.dim == (7, 6, 5)  # (dimX, dimY, dimZ)

    def test_vec3_roundtrip_axis_order(self, tmp_path):
        v = np.random.default_rng(5).random((4, 5, 6, 3)).astype(np.float32)
        path = str(tmp_path / "v.uni")
        write_uni(path, v)  # framework axis order in, manta order on disk
        out, header = read_uni(path)
        np.testing.assert_array_equal(out, v)
        out_manta, _ = read_uni(path, manta_order=True)
        np.testing.assert_array_equal(out_manta, v[..., ::-1])

    def test_uncompressed_roundtrip(self, tmp_path):
        d = np.random.default_rng(6).random((3, 4, 5)).astype(np.float32)
        path = str(tmp_path / "d_raw.uni")
        write_uni(path, d, compress=False)
        out, _ = read_uni(path)
        np.testing.assert_array_equal(out, d)

    def test_handbuilt_packed_header_fixture(self, tmp_path):
        # a writer that uses the fully-packed struct layout must also parse
        d = np.arange(2 * 3 * 4, dtype=np.float32).reshape(2, 3, 4)
        head = struct.pack("<6i256siQ", 4, 3, 2, 1, 1, 4, b"fixture", 1, 42)
        blob = b"MNT3" + head + d.tobytes()
        path = str(tmp_path / "packed.uni")
        with open(path, "wb") as f:
            f.write(gzip.compress(blob))
        out, header = read_uni(path)
        np.testing.assert_array_equal(out, d)
        assert header.timestamp == 42
        assert header.info == "fixture"

    def test_int_grid(self, tmp_path):
        flags = np.random.default_rng(7).integers(
            0, 4, (3, 3, 3)).astype(np.int32)
        path = str(tmp_path / "flags.uni")
        write_uni(path, flags)
        out, header = read_uni(path)
        assert out.dtype == np.int32
        np.testing.assert_array_equal(out, flags)

    def test_particles_roundtrip(self, tmp_path):
        pos = np.random.default_rng(8).random((30, 3)).astype(np.float32) * 10
        path = str(tmp_path / "p.uni")
        write_uni_particles(path, pos, grid_dim=(16, 16, 16))
        out, header = read_uni_particles(path)
        np.testing.assert_allclose(out, pos, atol=1e-6)
        assert header.magic == "PB02"

    def test_bad_magic_raises(self, tmp_path):
        path = str(tmp_path / "bad.uni")
        with open(path, "wb") as f:
            f.write(b"XXXX" + b"\x00" * 300)
        with pytest.raises(ValueError):
            read_uni(path)


class TestUniPdata:
    def test_scalar_roundtrip(self, tmp_path):
        from nfs_tpu.io.uni import read_uni_pdata, write_uni_pdata
        vals = np.random.default_rng(9).random(40).astype(np.float32)
        path = str(tmp_path / "pd.uni")
        write_uni_pdata(path, vals)
        out, header = read_uni_pdata(path)
        np.testing.assert_array_equal(out, vals)
        assert header.magic == "PD01"

    def test_vec3_roundtrip(self, tmp_path):
        from nfs_tpu.io.uni import read_uni_pdata, write_uni_pdata
        vals = np.random.default_rng(10).random((25, 3)).astype(np.float32)
        path = str(tmp_path / "pdv.uni")
        write_uni_pdata(path, vals)
        out, _ = read_uni_pdata(path)
        np.testing.assert_array_equal(out, vals)

    def test_int_roundtrip(self, tmp_path):
        from nfs_tpu.io.uni import read_uni_pdata, write_uni_pdata
        vals = np.arange(17, dtype=np.int32)
        path = str(tmp_path / "pdi.uni")
        write_uni_pdata(path, vals)
        out, _ = read_uni_pdata(path)
        assert out.dtype == np.int32
        np.testing.assert_array_equal(out, vals)
