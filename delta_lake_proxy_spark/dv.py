"""Delta deletion vectors (reader feature ``deletionVectors``): pure-Python
codec for the PUBLIC on-disk format so reader-3 DV tables are actually
readable instead of refused.

Everything here follows the published Delta protocol spec
(delta-io/delta PROTOCOL.md, "Deletion Vectors" + "Deletion Vector
Descriptor Schema") and the published RoaringFormatSpec
(RoaringBitmap/RoaringFormatSpec) — the reference proxy inherits the same
behavior from the ``deltalake`` crate it delegates opens to
(ref src/main.rs:357).

Format recap (all public):

* ``deletionVector`` descriptor on add/remove actions:
  ``storageType`` ("u" relative-from-UUID | "p" absolute | "i" inline),
  ``pathOrInlineDv``, ``offset`` (u/p only), ``sizeInBytes`` (size of the
  DV *data*), ``cardinality`` (number of deleted row indexes).
* DV data = ``<int32 LE magic 1681511377> <portable RoaringBitmapArray>``;
  the array is ``<int64 LE number-of-32-bit-bitmaps>`` then that many
  standard portable 32-bit RoaringBitmaps, the i-th holding the low 32
  bits of row indexes whose high 32 bits equal i.
* On-disk DV file: 1 version byte (=1), then per stored vector at
  ``offset``: ``<int32 BE dataSize> <data> <int32 BE crc32-of-data>``.
* ``storageType="u"``: the last 20 chars of ``pathOrInlineDv`` are the
  Z85-encoded 16-byte UUID, any preceding chars are a directory prefix;
  the file lives at ``<table>/<prefix>/deletion_vector_<uuid>.bin``.
* ``storageType="i"``: ``pathOrInlineDv`` is the Z85-encoded data itself.

The serializer also powers the DV-WRITING DELETE path
(``Engine.delete`` on ``delta.enableDeletionVectors=true`` tables): each
executor task serializes the merged position set for its own file via
:func:`write_uuid_dv_file`. All other commit producers refuse DV tables
(see deltalog.check_write_protocol).
"""

from __future__ import annotations

import os
import struct
import uuid as _uuid
import zlib

import numpy as np

DV_MAGIC = 1681511377
_SERIAL_COOKIE_NO_RUN = 12346
_SERIAL_COOKIE = 12347
_NO_OFFSET_THRESHOLD = 4
_ARRAY_MAX_CARD = 4096

# ZeroMQ Z85 alphabet (public spec 32/Z85)
_Z85_CHARS = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_INDEX = {c: i for i, c in enumerate(_Z85_CHARS)}


class DeletionVectorError(ValueError):
    """Malformed or unreadable deletion-vector payload."""


def z85_encode(data: bytes) -> str:
    if len(data) % 4:
        raise DeletionVectorError(f"z85 input must be 4-byte aligned, got {len(data)}")
    out = []
    for i in range(0, len(data), 4):
        v = int.from_bytes(data[i : i + 4], "big")
        chunk = []
        for _ in range(5):
            v, r = divmod(v, 85)
            chunk.append(_Z85_CHARS[r])
        out.extend(reversed(chunk))
    return "".join(out)


def z85_decode(text: str) -> bytes:
    if len(text) % 5:
        raise DeletionVectorError(f"z85 text must be 5-char aligned, got {len(text)}")
    out = bytearray()
    for i in range(0, len(text), 5):
        v = 0
        for c in text[i : i + 5]:
            try:
                v = v * 85 + _Z85_INDEX[c]
            except KeyError:
                raise DeletionVectorError(f"invalid z85 character {c!r}") from None
        if v > 0xFFFFFFFF:
            raise DeletionVectorError("z85 group overflows 32 bits")
        out += v.to_bytes(4, "big")
    return bytes(out)


# -- 32-bit RoaringBitmap, portable serialization (RoaringFormatSpec) --------


def _deserialize_roaring32(buf: memoryview, pos: int) -> tuple[np.ndarray, int]:
    """One portable 32-bit roaring bitmap starting at ``pos``; returns the
    sorted uint32 values and the offset just past the bitmap."""
    (cookie,) = struct.unpack_from("<i", buf, pos)
    if (cookie & 0xFFFF) == _SERIAL_COOKIE:
        size = (cookie >> 16) + 1
        pos += 4
        run_flags = bytes(buf[pos : pos + (size + 7) // 8])
        pos += (size + 7) // 8
        has_offsets = size >= _NO_OFFSET_THRESHOLD
    elif cookie == _SERIAL_COOKIE_NO_RUN:
        (size,) = struct.unpack_from("<i", buf, pos + 4)
        pos += 8
        run_flags = b"\x00" * ((size + 7) // 8)
        has_offsets = True
    else:
        raise DeletionVectorError(f"bad roaring cookie {cookie}")
    keys = np.empty(size, dtype=np.uint32)
    cards = np.empty(size, dtype=np.int64)
    for i in range(size):
        k, c = struct.unpack_from("<HH", buf, pos)
        keys[i] = k
        cards[i] = c + 1
        pos += 4
    if has_offsets:
        pos += 4 * size  # offsets are redundant for sequential decode
    parts: list[np.ndarray] = []
    for i in range(size):
        base = np.uint32(keys[i]) << np.uint32(16)
        if run_flags[i // 8] & (1 << (i % 8)):
            (n_runs,) = struct.unpack_from("<H", buf, pos)
            pos += 2
            runs = np.frombuffer(buf, dtype="<u2", count=2 * n_runs, offset=pos).reshape(
                n_runs, 2
            )
            pos += 4 * n_runs
            vals = np.concatenate(
                [
                    np.arange(int(s), int(s) + int(l) + 1, dtype=np.uint32)
                    for s, l in runs
                ]
                or [np.empty(0, dtype=np.uint32)]
            )
        elif cards[i] <= _ARRAY_MAX_CARD:
            vals = np.frombuffer(
                buf, dtype="<u2", count=int(cards[i]), offset=pos
            ).astype(np.uint32)
            pos += 2 * int(cards[i])
        else:
            words = np.frombuffer(buf, dtype="<u8", count=1024, offset=pos)
            pos += 8192
            bits = np.unpackbits(words.view(np.uint8), bitorder="little")
            vals = np.nonzero(bits)[0].astype(np.uint32)
        parts.append(vals + base)
    values = np.concatenate(parts) if parts else np.empty(0, dtype=np.uint32)
    return values, pos


def _serialize_roaring32(values: np.ndarray) -> bytes:
    """Portable serialization (no-run-container form: cookie 12346 with
    array/bitmap containers only — universally decodable)."""
    values = np.asarray(values, dtype=np.uint32)
    keys = (values >> np.uint32(16)).astype(np.uint16)
    uniq_keys, starts = np.unique(keys, return_index=True)
    size = len(uniq_keys)
    header = struct.pack("<ii", _SERIAL_COOKIE_NO_RUN, size)
    desc = bytearray()
    bodies: list[bytes] = []
    bounds = list(starts) + [len(values)]
    for i, k in enumerate(uniq_keys):
        lows = (values[bounds[i] : bounds[i + 1]] & np.uint32(0xFFFF)).astype("<u2")
        card = len(lows)
        desc += struct.pack("<HH", int(k), card - 1)
        if card <= _ARRAY_MAX_CARD:
            bodies.append(lows.tobytes())
        else:
            bits = np.zeros(65536, dtype=np.uint8)
            bits[lows.astype(np.int64)] = 1
            bodies.append(np.packbits(bits, bitorder="little").tobytes())
    offsets = bytearray()
    pos = len(header) + 4 * size + 4 * size  # header + desc + offset table
    for b in bodies:
        offsets += struct.pack("<i", pos)
        pos += len(b)
    return header + bytes(desc) + bytes(offsets) + b"".join(bodies)


# -- 64-bit RoaringBitmapArray (Delta's portable form) -----------------------


def decode_dv_data(data: bytes) -> np.ndarray:
    """DV *data* bytes (magic + portable RoaringBitmapArray) -> sorted
    int64 deleted row indexes."""
    if len(data) < 12:
        raise DeletionVectorError(f"DV data too short ({len(data)} bytes)")
    buf = memoryview(data)
    (magic,) = struct.unpack_from("<i", buf, 0)
    if magic != DV_MAGIC:
        raise DeletionVectorError(f"bad DV magic {magic} (want {DV_MAGIC})")
    (n_bitmaps,) = struct.unpack_from("<q", buf, 4)
    if n_bitmaps < 0 or n_bitmaps > 1 << 31:
        raise DeletionVectorError(f"implausible bitmap count {n_bitmaps}")
    pos = 12
    parts: list[np.ndarray] = []
    for high in range(n_bitmaps):
        vals, pos = _deserialize_roaring32(buf, pos)
        if len(vals):
            parts.append(vals.astype(np.int64) + (high << 32))
    if pos != len(data):
        raise DeletionVectorError(
            f"trailing bytes after bitmap array ({len(data) - pos})"
        )
    out = np.concatenate(parts) if parts else np.empty(0, dtype=np.int64)
    out.sort()
    return out


def encode_dv_data(positions) -> bytes:
    """Sorted/unsorted int64 row indexes -> DV data bytes (fixtures and
    round-trip tests)."""
    arr = np.unique(np.asarray(list(positions) if not isinstance(positions, np.ndarray) else positions, dtype=np.int64))
    if len(arr) and arr[0] < 0:
        raise DeletionVectorError("negative row index")
    highs = arr >> np.int64(32)
    n_bitmaps = int(highs[-1]) + 1 if len(arr) else 0
    out = bytearray(struct.pack("<iq", DV_MAGIC, n_bitmaps))
    for high in range(n_bitmaps):
        lows = (arr[highs == high] & np.int64(0xFFFFFFFF)).astype(np.uint32)
        out += _serialize_roaring32(lows)
    return bytes(out)


# -- descriptors and storage -------------------------------------------------


def dv_unique_id(dv: dict | None) -> str:
    """The descriptor identity Delta reconciles log actions by: an add and a
    remove refer to the same logical file iff (path, uniqueId) match.
    Empty string for DV-less actions, so plain tables reconcile by path
    exactly as before."""
    if not dv or not dv.get("storageType"):
        return ""
    uid = f"{dv['storageType']}{dv.get('pathOrInlineDv') or ''}"
    off = dv.get("offset")
    if off is not None:
        uid += f"@{off}"
    return uid


def dv_file_path(table_path: str, dv: dict) -> str:
    """Absolute path of the file holding a non-inline DV."""
    st = dv.get("storageType")
    rel = dv.get("pathOrInlineDv") or ""
    if st == "p":
        return rel
    if st == "u":
        if len(rel) < 20:
            raise DeletionVectorError(f"UUID DV path too short: {rel!r}")
        prefix, encoded = rel[:-20], rel[-20:]
        u = _uuid.UUID(bytes=z85_decode(encoded))
        name = f"deletion_vector_{u}.bin"
        return os.path.join(table_path, prefix, name) if prefix else os.path.join(table_path, name)
    raise DeletionVectorError(f"unsupported DV storageType {st!r}")


def load_dv_positions(table_path: str, dv: dict) -> np.ndarray:
    """Resolve + decode one descriptor to its sorted int64 deleted row
    indexes, verifying size, CRC, and cardinality. Runs executor-side in
    the scan paths (the descriptor, not the positions, ships in the plan)."""
    size = int(dv.get("sizeInBytes") or 0)
    if dv.get("storageType") == "i":
        data = z85_decode(dv.get("pathOrInlineDv") or "")
        # inline payloads are z85 (4-byte groups): the true data may be
        # shorter than the padded decode — sizeInBytes is authoritative
        if size and len(data) >= size:
            data = data[:size]
    else:
        path = dv_file_path(table_path, dv)
        off = int(dv.get("offset") or 0)
        with open(path, "rb") as f:
            f.seek(off)
            stored = f.read(4 + size + 4)
        if len(stored) < 4 + size + 4:
            raise DeletionVectorError(
                f"DV file {path} truncated at offset {off} (want {size} bytes)"
            )
        (stored_size,) = struct.unpack_from(">i", stored, 0)
        if stored_size != size:
            raise DeletionVectorError(
                f"DV size mismatch in {path}@{off}: stored {stored_size}, "
                f"descriptor {size}"
            )
        data = stored[4 : 4 + size]
        (crc,) = struct.unpack_from(">i", stored, 4 + size)
        if (zlib.crc32(data) & 0xFFFFFFFF) != (crc & 0xFFFFFFFF):
            raise DeletionVectorError(f"DV checksum mismatch in {path}@{off}")
    positions = decode_dv_data(data)
    card = dv.get("cardinality")
    if card is not None and int(card) != len(positions):
        raise DeletionVectorError(
            f"DV cardinality mismatch: descriptor {card}, bitmap {len(positions)}"
        )
    return positions


def write_dv_file(
    path: str, positions_per_dv: list, prefix_version_byte: bool = True
) -> list[dict]:
    """Write one on-disk DV file holding one vector per entry; returns the
    partial descriptors (storageType="p", absolute path) for each. Fixture
    helper — production tables are written by engines with writer-7
    support, not this one."""
    descs = []
    with open(path, "wb") as f:
        if prefix_version_byte:
            f.write(b"\x01")
        for positions in positions_per_dv:
            data = encode_dv_data(positions)
            off = f.tell()
            f.write(struct.pack(">i", len(data)))
            f.write(data)
            f.write(struct.pack(">I", zlib.crc32(data) & 0xFFFFFFFF))
            descs.append(
                {
                    "storageType": "p",
                    "pathOrInlineDv": path,
                    "offset": off,
                    "sizeInBytes": len(data),
                    "cardinality": len(np.unique(np.asarray(list(positions), dtype=np.int64))),
                }
            )
    return descs


def inline_descriptor(positions) -> dict:
    """Inline ("i") descriptor for the given deleted row indexes."""
    data = encode_dv_data(positions)
    pad = (-len(data)) % 4
    return {
        "storageType": "i",
        "pathOrInlineDv": z85_encode(data + b"\x00" * pad),
        "sizeInBytes": len(data),
        "cardinality": int(len(np.unique(np.asarray(list(positions), dtype=np.int64)))),
    }


def write_uuid_dv_file(table_path: str, positions) -> dict:
    """Write ONE deletion vector as a fresh ``deletion_vector_<uuid>.bin``
    at the table root ("u" storage, the delta-spark layout) and return its
    complete descriptor. Runs EXECUTOR-side in the DV-writing DELETE path —
    each task serializes the merged position set for its own file, so
    positions never travel to the driver."""
    import uuid as _uuid

    u = _uuid.uuid4()
    path = os.path.join(table_path, f"deletion_vector_{u}.bin")
    desc = write_dv_file(path, [positions])[0]
    desc["storageType"] = "u"
    desc["pathOrInlineDv"] = z85_encode(u.bytes)
    return desc
