"""Native `.bl2` (blosc2 contiguous frame) array codec — no python-blosc2.

The reference's default dense-depth output format is `.bl2`, written with
``blosc2.save_array(x, path, mode="w")`` and read with
``blosc2.load_array(path)`` (reference utils.py:363-364, 684-685). python
-blosc2 is not installable in this environment, so this module implements
the on-disk format from scratch. It is layered by how verifiable each part
is here:

1. **Chunk payloads (write)** — canonical c-blosc1 chunks produced by the
   system ``libblosc.so.1`` (bit-correct by construction; c-blosc2 documents
   backward compatibility with blosc1 chunks).
2. **Chunk payloads (read)** — both formats: blosc1 chunks (16-byte header,
   version 2) are delegated to libblosc1 directly; blosc2 extended-header
   chunks (32-byte header, as written by c-blosc2 schunks) are handled by
   parsing the extended header, then rewrapping block streams into an
   equivalent blosc1 chunk for libblosc1 to decompress (the codec *stream*
   formats — blosclz/LZ4/zlib/zstd — are identical between blosc1 and
   blosc2; only the container differs). blosc2-only features are handled
   explicitly: special-value chunks (zero/NaN/value runs) are materialized,
   dictionary compression raises a clear error.
3. **Frame container** — the "b2frame" contiguous-frame skeleton
   (c-blosc2 README_CFRAME_FORMAT.rst). The *reader* is deliberately
   lenient: it keys on the magic, a validated chunk walk, and the
   ``__pack_tensor__`` vlmeta entry rather than on every header field, so
   files from different c-blosc2 minor versions load. The *writer* follows
   the spec as closely as it can be reconstructed offline; strict
   both-direction interop with the real library is asserted by
   tests/test_bl2.py whenever ``import blosc2`` succeeds (it auto-skips
   here, where no blosc2 exists on the machine).

The chunk layer — where the compressed bits live — is covered by bit-level
interop tests against libblosc1 across codecs, shuffle modes and multi-block
chunks.
"""

from __future__ import annotations

import ctypes
import ctypes.util
import struct
from pathlib import Path

import numpy as np

from depth_completion_tpu.io import msgpack_lite as mp

__all__ = ["save_bl2", "load_bl2", "blosc1_available"]

# ---------------------------------------------------------------------------
# libblosc1 (system c-blosc 1.21.x) via ctypes
# ---------------------------------------------------------------------------

_BLOSC_MAX_OVERHEAD = 16


def _load_libblosc() -> ctypes.CDLL | None:
    for name in ("libblosc.so.1", "libblosc.so", ctypes.util.find_library("blosc")):
        if not name:
            continue
        try:
            lib = ctypes.CDLL(name)
        except OSError:
            continue
        lib.blosc_compress_ctx.restype = ctypes.c_int
        lib.blosc_decompress_ctx.restype = ctypes.c_int
        return lib
    return None


_blosc = _load_libblosc()


def blosc1_available() -> bool:
    """True when the system c-blosc1 library was found."""
    return _blosc is not None


def _require_blosc() -> ctypes.CDLL:
    if _blosc is None:
        raise RuntimeError(
            "libblosc.so.1 not found: the native .bl2 codec needs the system "
            "c-blosc1 library (or install python-blosc2). Use .npy/.npz/.dcz."
        )
    return _blosc


def blosc1_compress_chunk(
    data: bytes,
    typesize: int,
    clevel: int = 1,
    shuffle: int = 1,
    codec: str = "zstd",
    blocksize: int = 0,
) -> bytes:
    """One blosc1 chunk (header + compressed blocks) from raw bytes."""
    lib = _require_blosc()
    dest = ctypes.create_string_buffer(len(data) + _BLOSC_MAX_OVERHEAD + 4096)
    n = lib.blosc_compress_ctx(
        ctypes.c_int(clevel),
        ctypes.c_int(shuffle),
        ctypes.c_size_t(typesize),
        ctypes.c_size_t(len(data)),
        data,
        dest,
        ctypes.c_size_t(len(dest)),
        codec.encode(),
        ctypes.c_size_t(blocksize),
        ctypes.c_int(1),
    )
    if n <= 0:
        raise RuntimeError(f"blosc_compress_ctx failed (rc={n})")
    return dest.raw[:n]


def blosc1_decompress_chunk(chunk: bytes) -> bytes:
    """Decompress one blosc1-format chunk via libblosc1."""
    lib = _require_blosc()
    if len(chunk) < 16:
        raise ValueError("truncated blosc chunk")
    (nbytes,) = struct.unpack_from("<i", chunk, 4)
    dest = ctypes.create_string_buffer(max(nbytes, 1))
    n = lib.blosc_decompress_ctx(
        chunk, dest, ctypes.c_size_t(nbytes), ctypes.c_int(1)
    )
    if n != nbytes:
        raise RuntimeError(f"blosc_decompress_ctx failed (rc={n}, want {nbytes})")
    return dest.raw[:nbytes]


# ---------------------------------------------------------------------------
# blosc2 chunk reader (extended 32-byte header -> rewrap for libblosc1)
# ---------------------------------------------------------------------------

_B1_VERSION_FORMAT = 2
_FLAG_MEMCPYED = 0x2
_B2_USEDICT = 0x1
# filter ids in the blosc2 filter pipeline (chunk bytes 16..21)
_B2_FILTER_SHUFFLE = 1
_B2_FILTER_BITSHUFFLE = 2
_UNSUPPORTED_FILTERS = {3: "delta", 4: "truncation"}


def chunk_info(chunk: bytes) -> dict:
    """Parse the common chunk header fields (both blosc1 and blosc2)."""
    if len(chunk) < 16:
        raise ValueError("truncated blosc chunk header")
    nbytes, blocksize, cbytes = struct.unpack_from("<iii", chunk, 4)
    return {
        "version": chunk[0],
        "versionlz": chunk[1],
        "flags": chunk[2],
        "typesize": chunk[3],
        "nbytes": nbytes,
        "blocksize": blocksize,
        "cbytes": cbytes,
    }


def _plausible_chunk_header(buf: bytes, off: int, limit: int) -> bool:
    """Sanity-check that ``buf[off:]`` starts a blosc chunk that fits."""
    if off + 16 > limit:
        return False
    version, _, _, typesize = buf[off], buf[off + 1], buf[off + 2], buf[off + 3]
    if version not in (2, 3, 4, 5, 6) or typesize == 0:
        return False
    nbytes, blocksize, cbytes = struct.unpack_from("<iii", buf, off + 4)
    if nbytes <= 0 or cbytes < 16 or off + cbytes > limit:
        return False
    if blocksize <= 0 or blocksize > max(nbytes, 32):
        return False
    return True


def decompress_chunk(chunk: bytes) -> bytes:
    """Decompress one chunk in either blosc1 or blosc2 format."""
    info = chunk_info(chunk)
    if info["version"] <= _B1_VERSION_FORMAT:
        return blosc1_decompress_chunk(chunk)

    # blosc2 extended header (32 bytes): filters at 16..21, blosc2_flags at 31
    if len(chunk) < 32:
        raise ValueError("truncated blosc2 chunk header")
    nbytes = info["nbytes"]
    typesize = info["typesize"]
    blosc2_flags = chunk[31]
    if blosc2_flags & _B2_USEDICT:
        raise ValueError(
            ".bl2 chunk uses blosc2 dictionary compression, which the native "
            "codec does not support; install python-blosc2 to read this file"
        )
    special = (blosc2_flags >> 4) & 0x7
    if special:
        return _materialize_special(special, chunk, nbytes, typesize)

    flags = info["flags"]
    for f in chunk[16:22]:
        if f in _UNSUPPORTED_FILTERS:
            raise ValueError(
                f".bl2 chunk uses the blosc2 '{_UNSUPPORTED_FILTERS[f]}' "
                "filter; install python-blosc2 to read this file"
            )
        if f == _B2_FILTER_SHUFFLE:
            flags |= 0x1
        elif f == _B2_FILTER_BITSHUFFLE:
            flags |= 0x4

    if flags & _FLAG_MEMCPYED:
        body = chunk[32 : 32 + nbytes]
        if len(body) != nbytes:
            raise ValueError("truncated memcpyed blosc2 chunk")
        return bytes(body)

    # Rewrap the block section as a blosc1 chunk: same codec streams, same
    # bstarts array (shifted by the 16-byte header difference), 16B header.
    body = bytearray(chunk[32:])
    nblocks = -(-nbytes // info["blocksize"])
    if len(body) < 4 * nblocks:
        raise ValueError("truncated blosc2 chunk block index")
    bstarts = list(struct.unpack_from(f"<{nblocks}i", body, 0))
    struct.pack_into(f"<{nblocks}i", body, 0, *(b - 16 for b in bstarts))
    header = struct.pack(
        "<BBBBiii",
        _B1_VERSION_FORMAT,
        info["versionlz"],
        flags,
        typesize,
        nbytes,
        info["blocksize"],
        16 + len(body),
    )
    return blosc1_decompress_chunk(bytes(header) + bytes(body))


def _materialize_special(special: int, chunk: bytes, nbytes: int, ts: int) -> bytes:
    if special == 1 or special == 4:  # zeros / uninitialized
        return b"\x00" * nbytes
    if special == 2:  # NaN run (float typesize 4 or 8)
        if ts == 8:
            one = struct.pack("<d", float("nan"))
        else:
            one = struct.pack("<f", float("nan"))
        return (one * (nbytes // len(one) + 1))[:nbytes]
    if special == 3:  # repeated value, stored right after the header
        value = chunk[32 : 32 + ts]
        if len(value) != ts:
            raise ValueError("truncated special-value blosc2 chunk")
        return (value * (nbytes // ts + 1))[:nbytes]
    raise ValueError(f"unknown blosc2 special-value code {special}")


# ---------------------------------------------------------------------------
# Contiguous frame ("b2frame") writer
# ---------------------------------------------------------------------------

_MAGIC = b"b2frame\x00"
_DEFAULT_CHUNKSIZE = 1 << 22  # 4 MiB, multiple of every supported typesize


def _build_header(
    header_len: int,
    frame_len: int,
    nbytes: int,
    cbytes: int,
    typesize: int,
    blocksize: int,
    chunksize: int,
    has_vlmeta: bool,
) -> bytes:
    """Fixed-layout frame header (cframe spec: msgpack markers at fixed
    offsets — magic@2, header_len@11, frame_len@16, flags@25, nbytes@30,
    cbytes@39, typesize@48, blocksize@53, chunksize@58)."""
    out = bytearray()
    out += bytes([0x90 | 13, 0xA8]) + _MAGIC  # fixarray + fixstr8 magic
    out += b"\xd2" + struct.pack(">i", header_len)
    out += b"\xcf" + struct.pack(">Q", frame_len)
    # flags[4]: general (frame format version 1, 64-bit offsets not needed),
    # reserved, codec (zstd, matching the chunk payloads), other
    out += b"\xa4" + bytes([0x10 | 0x1, 0, 5, 0])
    out += b"\xd3" + struct.pack(">q", nbytes)
    out += b"\xd3" + struct.pack(">q", cbytes)
    out += b"\xd2" + struct.pack(">i", typesize)
    out += b"\xd2" + struct.pack(">i", blocksize)
    out += b"\xd2" + struct.pack(">i", chunksize)
    out += b"\xd1" + struct.pack(">h", 1)  # compression threads
    out += b"\xd1" + struct.pack(">h", 1)  # decompression threads
    out += b"\xc3" if has_vlmeta else b"\xc2"
    # filter pipeline: fixext16, type byte = number of filters, 16 data
    # bytes = 6 filter codes + udcodec + codec_meta + 6 filter metas + 2 pad
    pipeline = bytes([_B2_FILTER_SHUFFLE, 0, 0, 0, 0, 0, 0, 0]) + b"\x00" * 8
    out += b"\xd8" + bytes([1]) + pipeline
    # empty metalayers section: [idx_size, {}]-style index
    out += bytes([0x93, 0xCD, 0x00, 0x00, 0xDE, 0x00, 0x00])
    return bytes(out)


def _build_vlmeta_section(vlmeta: dict[str, bytes]) -> bytes:
    """Metalayer-index encoding used for vlmeta inside the trailer: a
    fixarray of [idx_size:u16, {name: offset:i32}], then the msgpack-bin
    contents each offset points at (offsets relative to section start)."""
    names = list(vlmeta)
    index = bytearray([0x93, 0xCD, 0x00, 0x00, 0xDE])
    index += struct.pack(">H", len(names))
    name_blobs = []
    for name in names:
        blob = mp.packb(name)
        name_blobs.append(blob)
        index += blob + b"\xd2\x00\x00\x00\x00"  # offset patched below
    idx_len = len(index)
    struct.pack_into(">H", index, 2, idx_len)
    contents = bytearray()
    offsets = []
    for name in names:
        offsets.append(idx_len + len(contents))
        contents += mp.packb(vlmeta[name])
    pos = 7
    for blob, off in zip(name_blobs, offsets):
        pos += len(blob)
        struct.pack_into(">i", index, pos + 1, off)
        pos += 5
    return bytes(index) + bytes(contents)


def _build_trailer(vlmeta: dict[str, bytes]) -> bytes:
    """Frame trailer: [version, vlmeta, trailer_len, fingerprint]."""
    section = _build_vlmeta_section(vlmeta)
    body = bytes([0x90 | 4, 0x01]) + section
    # trailer_len (uint32) + fixext16 zero fingerprint close the frame
    tail_len = len(body) + 5 + 18
    return body + b"\xce" + struct.pack(">I", tail_len) + b"\xd8\x00" + b"\x00" * 16


def save_bl2(
    x: np.ndarray,
    path: Path | str,
    clevel: int = 1,
    codec: str = "zstd",
    chunksize: int = _DEFAULT_CHUNKSIZE,
) -> None:
    """Write ``x`` as a blosc2 contiguous frame (`.bl2`).

    Defaults mirror python-blosc2's ``save_array`` cparams (zstd, clevel 1,
    byte-shuffle). Chunk payloads are canonical c-blosc1 chunks, which
    blosc2 readers accept.
    """
    path = Path(path)
    x = np.asarray(x)
    if not x.flags.c_contiguous:  # ascontiguousarray would promote 0-d to 1-d
        x = np.ascontiguousarray(x)
    data = x.tobytes()
    typesize = x.dtype.itemsize if 0 < x.dtype.itemsize <= 255 else 8
    chunksize = max(typesize, chunksize - (chunksize % typesize))
    shuffle = 1 if typesize > 1 else 0

    chunks = []
    for start in range(0, len(data), chunksize):
        chunks.append(
            blosc1_compress_chunk(
                data[start : start + chunksize],
                typesize,
                clevel=clevel,
                shuffle=shuffle,
                codec=codec,
            )
        )
    chunks_blob = b"".join(chunks)

    # chunk offsets (relative to the end of the header), stored as a
    # memcpyed blosc chunk of int64s, placed between chunks and trailer
    offs = np.zeros(len(chunks), dtype="<i8")
    pos = 0
    for i, c in enumerate(chunks):
        offs[i] = pos
        pos += len(c)
    coffsets = blosc1_compress_chunk(offs.tobytes(), 8, clevel=0, shuffle=0)

    vlmeta = {
        "__pack_tensor__": mp.packb(
            ["numpy", [int(s) for s in x.shape], x.dtype.str]
        )
    }
    trailer = _build_trailer(vlmeta)

    blocksize = chunk_info(chunks[0])["blocksize"] if chunks else 0
    header = _build_header(
        header_len=94,
        frame_len=0,  # patched below
        nbytes=len(data),
        cbytes=len(chunks_blob),
        typesize=typesize,
        blocksize=blocksize,
        chunksize=chunksize,
        has_vlmeta=True,
    )
    assert len(header) == 94, len(header)
    frame_len = len(header) + len(chunks_blob) + len(coffsets) + len(trailer)
    header = bytearray(header)
    struct.pack_into(">Q", header, 16, frame_len)
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "wb") as f:
        f.write(header)
        f.write(chunks_blob)
        f.write(coffsets)
        f.write(trailer)


# ---------------------------------------------------------------------------
# Frame reader (strict-offsets first, lenient fallback)
# ---------------------------------------------------------------------------


def _find_pack_tensor_meta(buf: bytes) -> tuple[list[int], np.dtype] | None:
    """Locate the ``__pack_tensor__`` vlmeta payload: a msgpack
    [kind, shape, dtype-str] triple somewhere after the marker name."""
    key = b"__pack_tensor__"
    start = buf.rfind(key)
    if start < 0:
        return None
    region = buf[start : start + 4096]
    for off in range(len(region)):
        if region[off] != 0x93:  # payload is a 3-element fixarray
            continue
        try:
            obj, _ = mp.unpack_from(region, off)
        except (ValueError, IndexError, struct.error):
            continue
        if (
            isinstance(obj, list)
            and len(obj) == 3
            and isinstance(obj[0], str)
            and isinstance(obj[1], list)
            and all(isinstance(s, int) and s >= 0 for s in obj[1])
            and isinstance(obj[2], str)
        ):
            try:
                dtype = np.dtype(obj[2])
            except TypeError:
                continue
            return [int(s) for s in obj[1]], dtype
    return None


def load_bl2(path: Path | str) -> np.ndarray:
    """Read a `.bl2` contiguous frame written by blosc2 or by save_bl2."""
    buf = Path(path).read_bytes()
    if buf[2:9] != _MAGIC[:7] and _MAGIC[:7] not in buf[:16]:
        raise ValueError(f"{path}: not a blosc2 frame (missing b2frame magic)")

    meta = _find_pack_tensor_meta(buf)
    if meta is None:
        raise ValueError(
            f"{path}: no __pack_tensor__ metadata found; was this file "
            "written by blosc2.save_array / save_bl2?"
        )
    shape, dtype = meta
    expected = int(np.prod(shape, dtype=np.int64)) * dtype.itemsize

    # chunks start at header_len (int32 BE at offset 11 per the spec);
    # fall back to scanning if that does not land on a valid chunk header
    starts = []
    if len(buf) > 15 and buf[10] == 0xD2:
        starts.append(struct.unpack_from(">i", buf, 11)[0])
    starts.extend(range(32, min(len(buf), 8192)))
    first = next(
        (s for s in starts if _plausible_chunk_header(buf, s, len(buf))), None
    )
    if first is None and expected == 0:
        return np.zeros(shape, dtype=dtype)
    if first is None:
        raise ValueError(f"{path}: could not locate the first blosc chunk")

    out = bytearray()
    off = first
    while len(out) < expected:
        if not _plausible_chunk_header(buf, off, len(buf)):
            raise ValueError(
                f"{path}: invalid chunk header at offset {off} "
                f"({len(out)}/{expected} bytes recovered)"
            )
        info = chunk_info(buf[off : off + 16])
        chunk = buf[off : off + info["cbytes"]]
        out += decompress_chunk(chunk)
        off += info["cbytes"]
    if len(out) > expected:
        del out[expected:]
    arr = np.frombuffer(bytes(out), dtype=dtype)
    return arr.reshape(tuple(shape))
