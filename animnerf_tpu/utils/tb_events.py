"""Pure-Python TensorBoard event-file writer (no tensorboard dependency).

The reference logs scalars and image triptychs through PyTorch-Lightning's
TensorBoardLogger (/root/reference/train.py:446-449, 377-383). This
environment has no tensorboard package, so the event files are written
directly: TFRecord framing (length + masked CRC32C) around hand-encoded
``Event`` protobuf messages, the exact on-disk format `tensorboard --logdir`
reads.

Wire format summary (tensorflow/core/util/event.proto):

  Event    { double wall_time = 1; int64 step = 2;
             string file_version = 3; Summary summary = 5; }
  Summary  { repeated Value value = 1; }
  Value    { string tag = 1; float simple_value = 2; Image image = 4; }
  Image    { int32 height = 1; int32 width = 2; int32 colorspace = 3;
             bytes encoded_image_string = 4; }

TFRecord framing per record:
  uint64 length (LE) | uint32 masked_crc32c(length bytes) |
  data | uint32 masked_crc32c(data)
"""

from __future__ import annotations

import io
import os
import socket
import struct
import time


# --------------------------------------------------------------------- crc32c

def _make_crc32c_table():
    poly = 0x82F63B78  # Castagnoli, reflected
    table = []
    for i in range(256):
        crc = i
        for _ in range(8):
            crc = (crc >> 1) ^ poly if crc & 1 else crc >> 1
        table.append(crc)
    return table


_CRC_TABLE = _make_crc32c_table()


def crc32c(data: bytes) -> int:
    crc = 0xFFFFFFFF
    for b in data:
        crc = _CRC_TABLE[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def _masked_crc(data: bytes) -> int:
    crc = crc32c(data)
    return ((((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF)


# ----------------------------------------------------------- protobuf encode

def _varint(n: int) -> bytes:
    if n < 0:
        n += 1 << 64  # protobuf int64 two's complement
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _key(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _f_double(field: int, v: float) -> bytes:
    return _key(field, 1) + struct.pack("<d", v)


def _f_float(field: int, v: float) -> bytes:
    return _key(field, 5) + struct.pack("<f", v)


def _f_varint(field: int, v: int) -> bytes:
    return _key(field, 0) + _varint(v)


def _f_bytes(field: int, v: bytes) -> bytes:
    return _key(field, 2) + _varint(len(v)) + v


def _f_str(field: int, v: str) -> bytes:
    return _f_bytes(field, v.encode("utf-8"))


def _encode_png(img) -> tuple[bytes, int, int]:
    """uint8 (H, W, 3) array -> (png bytes, height, width)."""
    from PIL import Image

    h, w = img.shape[:2]
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    return buf.getvalue(), h, w


class EventWriter:
    """Writes a ``events.out.tfevents.*`` file TensorBoard can load."""

    def __init__(self, log_dir: str):
        os.makedirs(log_dir, exist_ok=True)
        fname = "events.out.tfevents.%010d.%s" % (
            int(time.time()), socket.gethostname())
        self._f = open(os.path.join(log_dir, fname), "ab")
        self.path = self._f.name
        # header event: file_version (field 3)
        self._write_event(_f_double(1, time.time())
                          + _f_str(3, "brain.Event:2"))

    # ------------------------------------------------------------ low level

    def _write_event(self, event_bytes: bytes) -> None:
        length = struct.pack("<Q", len(event_bytes))
        self._f.write(length)
        self._f.write(struct.pack("<I", _masked_crc(length)))
        self._f.write(event_bytes)
        self._f.write(struct.pack("<I", _masked_crc(event_bytes)))
        self._f.flush()

    def _summary_event(self, step: int, values: bytes) -> None:
        summary = _f_bytes(5, values)
        self._write_event(
            _f_double(1, time.time()) + _f_varint(2, step) + summary)

    # ----------------------------------------------------------- public API

    def add_scalar(self, tag: str, value: float, step: int) -> None:
        v = _f_str(1, tag) + _f_float(2, float(value))
        self._summary_event(step, _f_bytes(1, v))

    def add_scalars(self, scalars: dict, step: int) -> None:
        """All tags in one Event (one Summary with several Values)."""
        vals = b"".join(
            _f_bytes(1, _f_str(1, tag) + _f_float(2, float(v)))
            for tag, v in scalars.items())
        self._summary_event(step, vals)

    def add_image(self, tag: str, img, step: int) -> None:
        """img: uint8 (H, W, 3) numpy array."""
        png, h, w = _encode_png(img)
        image = (_f_varint(1, h) + _f_varint(2, w) + _f_varint(3, 3)
                 + _f_bytes(4, png))
        v = _f_str(1, tag) + _f_bytes(4, image)
        self._summary_event(step, _f_bytes(1, v))

    def close(self) -> None:
        self._f.close()


# ------------------------------------------------------------------- reading
# Minimal reader used by tests to verify files round-trip (TensorBoard
# itself is not installed here).

def read_events(path: str) -> list[dict]:
    """Parse an event file back into dicts: {step, wall_time, scalars: {tag:
    value}, images: {tag: png_bytes}, file_version?}."""
    out = []
    with open(path, "rb") as f:
        data = f.read()
    pos = 0
    while pos < len(data):
        (length,) = struct.unpack_from("<Q", data, pos)
        (len_crc,) = struct.unpack_from("<I", data, pos + 8)
        assert len_crc == _masked_crc(data[pos:pos + 8]), "length crc mismatch"
        rec = data[pos + 12:pos + 12 + length]
        (rec_crc,) = struct.unpack_from("<I", data, pos + 12 + length)
        assert rec_crc == _masked_crc(rec), "data crc mismatch"
        pos += 12 + length + 4
        out.append(_parse_event(rec))
    return out


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = shift = 0
    while True:
        b = buf[pos]
        result |= (b & 0x7F) << shift
        pos += 1
        if not b & 0x80:
            return result, pos
        shift += 7


def _parse_fields(buf: bytes):
    pos = 0
    while pos < len(buf):
        key, pos = _read_varint(buf, pos)
        field, wire = key >> 3, key & 7
        if wire == 0:
            val, pos = _read_varint(buf, pos)
        elif wire == 1:
            val = struct.unpack_from("<d", buf, pos)[0]
            pos += 8
        elif wire == 5:
            val = struct.unpack_from("<f", buf, pos)[0]
            pos += 4
        elif wire == 2:
            ln, pos = _read_varint(buf, pos)
            val = buf[pos:pos + ln]
            pos += ln
        else:  # pragma: no cover
            raise ValueError(f"unsupported wire type {wire}")
        yield field, wire, val


def _parse_event(rec: bytes) -> dict:
    ev = {"scalars": {}, "images": {}}
    for field, wire, val in _parse_fields(rec):
        if field == 1:
            ev["wall_time"] = val
        elif field == 2:
            ev["step"] = val
        elif field == 3:
            ev["file_version"] = val.decode()
        elif field == 5:
            for f2, _, v2 in _parse_fields(val):
                if f2 == 1:  # Summary.Value
                    tag, scalar, image = None, None, None
                    for f3, w3, v3 in _parse_fields(v2):
                        if f3 == 1:
                            tag = v3.decode()
                        elif f3 == 2 and w3 == 5:
                            scalar = v3
                        elif f3 == 4:
                            for f4, _, v4 in _parse_fields(v3):
                                if f4 == 4:
                                    image = v4
                    if scalar is not None:
                        ev["scalars"][tag] = scalar
                    if image is not None:
                        ev["images"][tag] = image
    return ev
