"""Columnar page wire format (the engine's PrestoPage analog).

Reference: velox/serializers/PrestoSerializer.cpp (the default shuffle format:
columnar, optionally compressed, CRC-protected) and the VectorSerde registry
(velox/vector/VectorStream.h:63); integer columns use lightweight RLE/varint
encodings like the reference's dwio integer encoders
(velox/dwio/common/IntDecoder.h), implemented natively (velox_tpu/native).

In the TPU engine rows cross device boundaries as collectives (parallel/
exchange.py), so this format exists for the *host* boundaries the reference
also serves: persistence of intermediate results, spill files, cross-process
interchange, and parity testing.  Layout (little-endian):

  [magic u32][flags u8][ncols u16][nrows u64][crc u32][payload]
  payload per column:
    [name_len u16][name utf8][dtype_tag u16][precision u8][scale u8]
    [has_validity u8][validity bitmap ceil(n/8) bytes]
    [encoding u8][data_len u64][data bytes]
        encoding 0: raw numpy little-endian
        encoding 1: zigzag-varint RLE over int64
        encoding 2: zigzag-varint RLE over int64 deltas (sorted-ish columns)
    [dict_len u64][dictionary utf8 blob]            (VARCHAR only: \\x00-joined)

flags bit0: zlib-compressed payload.
"""

from __future__ import annotations

import io
import struct
import zlib
from typing import Dict, Optional

import numpy as np

from ..dtypes import DataType, RowType, TypeKind
from ..io.table import Table
from ..vector.string_table import StringTable
from .. import native

_MAGIC = 0x56585047  # "VXPG"

_TAGS = {k: i for i, k in enumerate(TypeKind)}
_KINDS = {i: k for k, i in _TAGS.items()}

_RAW, _RLE, _RLE_DELTA = 0, 1, 2


def _pack_bitmap(validity: np.ndarray) -> bytes:
    return np.packbits(validity.astype(np.uint8), bitorder="little").tobytes()


def _unpack_bitmap(data: bytes, n: int) -> np.ndarray:
    return np.unpackbits(
        np.frombuffer(data, dtype=np.uint8), bitorder="little", count=n
    ).astype(bool)


def _encode_column(arr: np.ndarray) -> tuple:
    """Pick the smallest of raw / RLE / delta-RLE for integer columns."""
    raw = arr.astype(arr.dtype.newbyteorder("<")).tobytes()
    if arr.dtype.kind not in "iu" or arr.size == 0:
        return _RAW, raw
    i64 = arr.astype(np.int64)
    rle = native.encode_i64(i64)
    best_enc, best = _RAW, raw
    if len(rle) < len(best):
        best_enc, best = _RLE, rle
    # delta pays off on sorted/sequential columns; cheap to try
    delta = native.encode_i64(i64, delta=True)
    if len(delta) < len(best):
        best_enc, best = _RLE_DELTA, delta
    return best_enc, best


def serialize_page(table: Table, compress: bool = True) -> bytes:
    """Serialize a host Table chunk to one page."""
    n = table.num_rows
    body = io.BytesIO()
    for name, dtype in zip(table.schema.names, table.schema.types):
        nb = name.encode("utf-8")
        body.write(struct.pack("<H", len(nb)))
        body.write(nb)
        body.write(
            struct.pack(
                "<HBB",
                _TAGS[dtype.kind],
                dtype.precision or 0,
                dtype.scale or 0,
            )
        )
        validity = table.validities.get(name)
        if validity is None:
            body.write(struct.pack("<B", 0))
        else:
            body.write(struct.pack("<B", 1))
            body.write(_pack_bitmap(validity))
        arr = np.ascontiguousarray(table.columns[name])
        encoding, data = _encode_column(arr)
        body.write(struct.pack("<BQ", encoding, len(data)))
        body.write(data)
        if dtype.is_string and name in table.string_tables:
            blob = "\x00".join(table.string_tables[name].values()).encode("utf-8")
            body.write(struct.pack("<Q", len(blob)))
            body.write(blob)
        else:
            body.write(struct.pack("<Q", 0))
    payload = body.getvalue()
    flags = 0
    if compress:
        payload = zlib.compress(payload, level=1)
        flags |= 1
    crc = zlib.crc32(payload) & 0xFFFFFFFF
    header = struct.pack(
        "<IBHQI", _MAGIC, flags, len(table.schema.names), n, crc
    )
    return header + payload


_NP_DTYPES = {
    TypeKind.BOOLEAN: np.bool_,
    TypeKind.TINYINT: np.int8,
    TypeKind.SMALLINT: np.int16,
    TypeKind.INTEGER: np.int32,
    TypeKind.BIGINT: np.int64,
    TypeKind.REAL: np.float32,
    TypeKind.DOUBLE: np.float64,
    TypeKind.TIMESTAMP: np.int64,
    TypeKind.DATE: np.int32,
    TypeKind.DECIMAL: np.int64,
    TypeKind.VARCHAR: np.int32,
    TypeKind.VARBINARY: np.int32,
}


def deserialize_page(buf: bytes) -> Table:
    magic, flags, ncols, nrows, crc = struct.unpack_from("<IBHQI", buf, 0)
    if magic != _MAGIC:
        raise ValueError("not a velox_tpu page")
    payload = buf[struct.calcsize("<IBHQI") :]
    if zlib.crc32(payload) & 0xFFFFFFFF != crc:
        raise ValueError("page checksum mismatch")
    if flags & 1:
        payload = zlib.decompress(payload)
    off = 0
    names, types = [], []
    cols: Dict[str, np.ndarray] = {}
    validities: Dict[str, np.ndarray] = {}
    tables: Dict[str, StringTable] = {}
    for _ in range(ncols):
        (name_len,) = struct.unpack_from("<H", payload, off)
        off += 2
        name = payload[off : off + name_len].decode("utf-8")
        off += name_len
        tag, precision, scale = struct.unpack_from("<HBB", payload, off)
        off += 4
        kind = _KINDS[tag]
        if kind == TypeKind.DECIMAL:
            dtype = DataType(kind, precision=precision, scale=scale)
        else:
            dtype = DataType(kind)
        (has_validity,) = struct.unpack_from("<B", payload, off)
        off += 1
        if has_validity:
            nbytes = (nrows + 7) // 8
            validities[name] = _unpack_bitmap(payload[off : off + nbytes], nrows)
            off += nbytes
        encoding, data_len = struct.unpack_from("<BQ", payload, off)
        off += 9
        raw = payload[off : off + data_len]
        off += data_len
        np_dtype = _NP_DTYPES[kind]
        if encoding == _RAW:
            arr = np.frombuffer(raw, dtype=np_dtype).copy()
        else:
            arr = native.decode_i64(
                raw, nrows, delta=(encoding == _RLE_DELTA)
            ).astype(np_dtype)
        (dict_len,) = struct.unpack_from("<Q", payload, off)
        off += 8
        if dict_len:
            blob = payload[off : off + dict_len].decode("utf-8")
            off += dict_len
            values = blob.split("\x00")
            table = StringTable()
            remap = table.intern_all(values)
            arr = remap[arr]
            tables[name] = table
        names.append(name)
        types.append(dtype)
        cols[name] = arr
    return Table(RowType(names, types), cols, tables, validities)
