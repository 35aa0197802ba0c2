"""Tests for the pure-Python TensorBoard event writer."""

import struct

import numpy as np

from animnerf_tpu.utils.tb_events import (
    EventWriter,
    _masked_crc,
    crc32c,
    read_events,
)


def test_crc32c_known_vectors():
    """Known CRC-32C (Castagnoli) test vectors (RFC 3720 appendix B.4)."""
    assert crc32c(b"") == 0x00000000
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(bytes(32)) == 0x8A9136AA
    assert crc32c(bytes([0xFF] * 32)) == 0x62A8AB43


def test_event_file_roundtrip(tmp_path):
    w = EventWriter(str(tmp_path))
    w.add_scalar("train/loss", 0.5, step=1)
    w.add_scalars({"train/psnr": 22.5, "train/lr": 5e-4}, step=2)
    img = np.zeros((4, 6, 3), np.uint8)
    img[..., 0] = 255
    w.add_image("val/triptych", img, step=3)
    w.close()

    events = read_events(w.path)
    assert events[0]["file_version"] == "brain.Event:2"
    assert events[1]["step"] == 1
    np.testing.assert_allclose(events[1]["scalars"]["train/loss"], 0.5)
    assert events[2]["step"] == 2
    np.testing.assert_allclose(events[2]["scalars"]["train/psnr"], 22.5,
                               rtol=1e-6)
    np.testing.assert_allclose(events[2]["scalars"]["train/lr"], 5e-4,
                               rtol=1e-6)
    # image event decodes back to the original pixels
    png = events[3]["images"]["val/triptych"]
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    import io

    from PIL import Image

    arr = np.asarray(Image.open(io.BytesIO(png)))
    np.testing.assert_array_equal(arr, img)


def test_tfrecord_framing(tmp_path):
    """Record framing must match the TFRecord spec byte-for-byte so real
    TensorBoard can read it: len(8) | crc(len) | data | crc(data)."""
    w = EventWriter(str(tmp_path))
    w.add_scalar("a", 1.0, step=0)
    w.close()
    with open(w.path, "rb") as f:
        data = f.read()
    (length,) = struct.unpack_from("<Q", data, 0)
    (lc,) = struct.unpack_from("<I", data, 8)
    assert lc == _masked_crc(data[:8])
    rec = data[12:12 + length]
    (dc,) = struct.unpack_from("<I", data, 12 + length)
    assert dc == _masked_crc(rec)
