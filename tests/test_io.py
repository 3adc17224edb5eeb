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


class TestUniByteFixtures:
    """Hand-built byte fixtures matching mantaflow's actual gzopen file
    layout (SURVEY.md §4; VERDICT r1 missing #7: self-round-trip alone
    cannot catch a layout bug on both sides).

    Source of truth: mantaflow source/fileio/iogrids.cpp — the header is
    gzwritten as the raw C struct
      { int dimX, dimY, dimZ, gridType, elementType, bytesPerElement;
        char info[256]; int dimT; unsigned long long timestamp; }   (MNT3)
    with natural alignment (4 pad bytes before the 8-aligned timestamp,
    sizeof == 296), inside ONE gzip stream, followed by the raw cell data
    indexed (z*dimY + y)*dimX + x, Vec3 cells as (x, y, z) floats.
    """

    def _grid_bytes(self, arr_zyx, grid_type=1, elem_type=1,
                    info=b"mantaflow test", dim_t=1, ts=1234567890123):
        import struct as st
        dz, dy, dx = arr_zyx.shape[:3]
        n_comp = 1 if arr_zyx.ndim == 3 else arr_zyx.shape[3]
        head = st.pack("<6i256si4xQ", dx, dy, dz, grid_type, elem_type,
                       4 * n_comp, info.ljust(256, b"\x00"), dim_t, ts)
        return b"MNT3" + head + arr_zyx.astype("<f4").tobytes()

    def test_mnt3_scalar_grid_fixture(self, tmp_path):
        import gzip
        from nfs_tpu.io.uni import read_uni
        rng = np.random.default_rng(0)
        arr = rng.random((5, 4, 3)).astype(np.float32)  # (z, y, x)
        path = tmp_path / "g.uni"
        path.write_bytes(gzip.compress(self._grid_bytes(arr)))
        got, header = read_uni(str(path))
        assert np.array_equal(got, arr)
        assert header.magic == "MNT3"
        assert header.dim == (3, 4, 5)  # (dimX, dimY, dimZ) as written
        assert header.bytes_per_element == 4
        assert header.info == "mantaflow test"
        assert header.timestamp == 1234567890123

    def test_mnt3_vec3_grid_channel_order(self, tmp_path):
        import gzip
        from nfs_tpu.io.uni import read_uni
        # distinct constants per manta channel: vx=1, vy=2, vz=3
        arr = np.zeros((4, 3, 2, 3), np.float32)
        arr[..., 0], arr[..., 1], arr[..., 2] = 1.0, 2.0, 3.0
        path = tmp_path / "v.uni"
        path.write_bytes(gzip.compress(
            self._grid_bytes(arr, grid_type=4, elem_type=2)))
        got, _ = read_uni(str(path))                  # framework order
        assert got.shape == (4, 3, 2, 3)
        # framework channel i = component along array axis i: (vz, vy, vx)
        assert np.all(got[..., 0] == 3.0)
        assert np.all(got[..., 2] == 1.0)
        got_m, _ = read_uni(str(path), manta_order=True)
        assert np.all(got_m[..., 0] == 1.0)

    def test_raw_uncompressed_stream_accepted(self, tmp_path):
        from nfs_tpu.io.uni import read_uni
        arr = np.arange(24, dtype=np.float32).reshape(2, 3, 4)
        path = tmp_path / "raw.uni"
        path.write_bytes(self._grid_bytes(arr))
        got, _ = read_uni(str(path))
        assert np.array_equal(got, arr)

    def test_pb02_particle_fixture(self, tmp_path):
        import gzip
        import struct as st
        from nfs_tpu.io.uni import read_uni_particles
        # BasicParticleData: Vec3 pos (x,y,z) + int32 flag -> bpe 16
        n = 7
        rng = np.random.default_rng(1)
        pos_xyz = rng.random((n, 3)).astype(np.float32) * 10
        rec = np.zeros((n, 4), np.float32)
        rec[:, :3] = pos_xyz
        head = st.pack("<6i256s4xQ", n, 16, 8, 16, 0, 16,
                       b"parts".ljust(256, b"\x00"), 42)
        path = tmp_path / "p.uni"
        path.write_bytes(gzip.compress(b"PB02" + head + rec.tobytes()))
        got, header = read_uni_particles(str(path))   # framework (z,y,x)
        assert got.shape == (n, 3)
        assert np.array_equal(got, pos_xyz[:, ::-1])
        got_m, _ = read_uni_particles(str(path), manta_order=True)
        assert np.array_equal(got_m, pos_xyz)
        assert header.timestamp == 42

    def test_pd01_pdata_fixture(self, tmp_path):
        import gzip
        import struct as st
        from nfs_tpu.io.uni import read_uni_pdata
        vals = np.linspace(0, 1, 9).astype(np.float32)
        head = st.pack("<6i256s4xQ", 9, 0, 0, 0, 1, 4,
                       b"density".ljust(256, b"\x00"), 7)
        path = tmp_path / "pd.uni"
        path.write_bytes(gzip.compress(b"PD01" + head + vals.tobytes()))
        got, header = read_uni_pdata(str(path))
        assert np.array_equal(got, vals)
        assert header.info == "density"

    def test_writer_reader_agree_with_fixture_layout(self, tmp_path):
        # the writer must emit the exact layout the fixtures encode
        import gzip
        from nfs_tpu.io.uni import write_uni
        arr = np.random.default_rng(2).random((3, 4, 5)).astype(np.float32)
        path = tmp_path / "w.uni"
        write_uni(str(path), arr, info="mantaflow test")
        data = gzip.decompress(path.read_bytes())
        expect = self._grid_bytes(arr)
        # equal up to the timestamp field (last 8 bytes of the header)
        assert data[:4 + 288] == expect[:4 + 288]
        assert data[4 + 296:] == expect[4 + 296:]
