"""Native .bl2 codec: msgpack, chunk-layer interop vs libblosc1, frames.

The chunk layer is validated bit-level against the system c-blosc1 library
(blosc2 chunks are a container superset of blosc1 chunks — see io/bl2.py).
Strict both-direction interop with the real python-blosc2 runs whenever
that package is importable (absent in this environment — auto-skip).
"""

import struct

import numpy as np
import pytest

from depth_completion_tpu.io import msgpack_lite as mp
from depth_completion_tpu.io.bl2 import (
    blosc1_available,
    blosc1_compress_chunk,
    chunk_info,
    decompress_chunk,
    load_bl2,
    save_bl2,
)

pytestmark = pytest.mark.skipif(
    not blosc1_available(), reason="system libblosc1 not found"
)

try:
    import blosc2  # type: ignore

    HAVE_BLOSC2 = True
except ImportError:
    HAVE_BLOSC2 = False


# ---------------------------------------------------------------------------
# msgpack subset
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "obj",
    [
        None,
        True,
        False,
        0,
        1,
        127,
        128,
        255,
        256,
        65535,
        65536,
        2**32,
        -1,
        -32,
        -33,
        -129,
        -(2**20),
        -(2**40),
        3.5,
        "",
        "hello",
        "x" * 40,
        "x" * 300,
        b"",
        b"bytes",
        b"y" * 300,
        [],
        [1, "two", [3.0, None]],
        list(range(20)),
        {},
        {"a": 1, "b": [2, 3]},
        ["numpy", [352, 1216], "<f4"],
    ],
)
def test_msgpack_roundtrip(obj):
    assert mp.unpackb(mp.packb(obj)) == (
        list(obj) if isinstance(obj, tuple) else obj
    )


def test_msgpack_fixext16():
    buf = b"\xd8\x00" + bytes(range(16))
    obj, end = mp.unpack_from(buf)
    assert obj == (0, bytes(range(16))) and end == 18


# ---------------------------------------------------------------------------
# chunk layer: our decoder vs libblosc1 ground truth
# ---------------------------------------------------------------------------


def _payloads():
    rng = np.random.default_rng(7)
    smooth = np.cumsum(rng.normal(size=50_000)).astype(np.float32)
    return [
        ("f32-smooth", smooth, 4),
        ("f64", smooth.astype(np.float64), 8),
        ("u16", (smooth * 10).astype(np.uint16), 2),
        ("u8-noise", rng.integers(0, 256, 30_000).astype(np.uint8), 1),
        ("zeros", np.zeros(70_000, np.float32), 4),
    ]


@pytest.mark.parametrize("codec", ["blosclz", "lz4", "lz4hc", "zlib", "zstd"])
@pytest.mark.parametrize("shuffle", [0, 1])
def test_blosc1_chunk_roundtrip(codec, shuffle):
    for name, arr, ts in _payloads():
        data = arr.tobytes()
        chunk = blosc1_compress_chunk(data, ts, clevel=5, shuffle=shuffle, codec=codec)
        assert decompress_chunk(chunk) == data, (name, codec, shuffle)


def test_multiblock_chunk():
    arr = np.arange(500_000, dtype=np.float32)
    chunk = blosc1_compress_chunk(arr.tobytes(), 4, blocksize=65536)
    assert chunk_info(chunk)["blocksize"] == 65536
    assert decompress_chunk(chunk) == arr.tobytes()


def _as_blosc2_chunk(b1_chunk: bytes) -> bytes:
    """Re-container a blosc1 chunk as a blosc2 extended-header chunk, the
    inverse of the rewrap io/bl2.py performs — exercises that path."""
    info = chunk_info(b1_chunk)
    nblocks = -(-info["nbytes"] // info["blocksize"])
    body = bytearray(b1_chunk[16:])
    if not info["flags"] & 0x2:  # skip bstart shift for memcpyed chunks
        bstarts = list(struct.unpack_from(f"<{nblocks}i", body, 0))
        struct.pack_into(f"<{nblocks}i", body, 0, *(b + 16 for b in bstarts))
    filters = bytearray(6)
    if info["flags"] & 0x1:
        filters[5] = 1  # byte-shuffle in the filter pipeline
    header = struct.pack(
        "<BBBBiii",
        5,  # blosc2 format version
        info["versionlz"],
        info["flags"],
        info["typesize"],
        info["nbytes"],
        info["blocksize"],
        32 + len(body),
    )
    ext = bytes(filters) + bytes(10)  # filters, udcodec/meta/reserved/b2flags
    return header + ext + bytes(body)


@pytest.mark.parametrize("codec", ["blosclz", "lz4", "zstd"])
def test_blosc2_extended_chunk_decode(codec):
    arr = np.cumsum(np.ones(100_000, np.float32) * 0.25)
    data = arr.tobytes()
    b1 = blosc1_compress_chunk(data, 4, clevel=5, shuffle=1, codec=codec)
    assert decompress_chunk(_as_blosc2_chunk(b1)) == data


def test_blosc2_memcpyed_chunk_decode():
    data = np.random.default_rng(3).bytes(10_000)
    b1 = blosc1_compress_chunk(data, 1, clevel=0, shuffle=0)
    assert chunk_info(b1)["flags"] & 0x2  # memcpyed
    assert decompress_chunk(_as_blosc2_chunk(b1)) == data


def test_blosc2_special_value_chunks():
    def special(code, nbytes, ts, tail=b""):
        header = struct.pack("<BBBBiii", 5, 1, 0, ts, nbytes, nbytes, 32 + len(tail))
        ext = bytes(15) + bytes([code << 4])
        return header + ext + tail

    assert decompress_chunk(special(1, 64, 4)) == b"\x00" * 64
    nans = np.frombuffer(decompress_chunk(special(2, 64, 4)), np.float32)
    assert np.all(np.isnan(nans))
    val = struct.pack("<f", 2.5)
    out = np.frombuffer(decompress_chunk(special(3, 64, 4, tail=val)), np.float32)
    np.testing.assert_array_equal(out, np.full(16, 2.5, np.float32))


def test_dict_compression_rejected():
    header = struct.pack("<BBBBiii", 5, 1, 0, 4, 64, 64, 40)
    chunk = header + bytes(15) + b"\x01" + bytes(8)
    with pytest.raises(ValueError, match="dictionary"):
        decompress_chunk(chunk)


# ---------------------------------------------------------------------------
# frame layer
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "arr",
    [
        np.random.default_rng(0).normal(size=(352, 1216)).astype(np.float32),
        np.arange(24, dtype=np.float64).reshape(2, 3, 4),
        np.random.default_rng(1).integers(0, 2**16, (33, 7)).astype(np.uint16),
        np.float32(3.25),  # 0-d
        np.zeros((0, 5), np.float32),  # empty
    ],
)
def test_frame_roundtrip(tmp_path, arr):
    arr = np.asarray(arr)
    p = tmp_path / "x.bl2"
    save_bl2(arr, p)
    out = load_bl2(p)
    assert out.dtype == arr.dtype and out.shape == arr.shape
    np.testing.assert_array_equal(out, arr)


def test_frame_multichunk(tmp_path):
    arr = np.random.default_rng(2).normal(size=(300, 500)).astype(np.float32)
    p = tmp_path / "big.bl2"
    save_bl2(arr, p, chunksize=1 << 16)  # forces ~10 chunks
    np.testing.assert_array_equal(load_bl2(p), arr)


def test_frame_magic_and_size(tmp_path):
    arr = np.zeros((64, 64), np.float32)
    p = tmp_path / "m.bl2"
    save_bl2(arr, p)
    raw = p.read_bytes()
    assert raw[2:9] == b"b2frame"
    assert struct.unpack_from(">Q", raw, 16)[0] == len(raw)  # frame_len field
    assert len(raw) < arr.nbytes  # zeros compress


def test_frame_rejects_non_bl2(tmp_path):
    p = tmp_path / "junk.bl2"
    p.write_bytes(b"\x00" * 256)
    with pytest.raises(ValueError, match="magic"):
        load_bl2(p)


def test_frame_missing_meta(tmp_path):
    p = tmp_path / "nometa.bl2"
    p.write_bytes(b"\x9d\xa8b2frame\x00" + b"\x00" * 128)
    with pytest.raises(ValueError, match="__pack_tensor__"):
        load_bl2(p)


# ---------------------------------------------------------------------------
# strict interop with the real python-blosc2 (auto-skips when absent)
# ---------------------------------------------------------------------------


@pytest.mark.skipif(not HAVE_BLOSC2, reason="python-blosc2 not installed")
def test_real_blosc2_reads_ours(tmp_path):
    arr = np.random.default_rng(5).normal(size=(80, 120)).astype(np.float32)
    p = tmp_path / "ours.bl2"
    save_bl2(arr, p)
    np.testing.assert_array_equal(blosc2.load_array(str(p)), arr)


@pytest.mark.skipif(not HAVE_BLOSC2, reason="python-blosc2 not installed")
def test_we_read_real_blosc2(tmp_path):
    arr = np.random.default_rng(6).normal(size=(80, 120)).astype(np.float32)
    p = tmp_path / "theirs.bl2"
    blosc2.save_array(arr, str(p), mode="w")
    np.testing.assert_array_equal(load_bl2(p), arr)
