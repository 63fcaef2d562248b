"""The self-contained TensorBoard event writer (utils/tb_events.py).

Fast checks: CRC32C known vectors, TFRecord framing, and a proto-level
round-trip with an independent minimal decoder written here. A slow test
additionally loads the file with the real TensorBoard reader when the
``tensorboard`` package is importable (it verifies the masked CRCs, so it
is the end-to-end proof that stock ``tensorboard --logdir`` accepts the
output — reference train.py:467-472 parity).
"""

import glob
import os
import struct

import pytest

from mintime_tpu.utils.tb_events import EventFileWriter, _masked_crc, crc32c


def test_crc32c_known_vectors():
    # RFC 3720 §B.4 test vectors
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"") == 0x0
    assert crc32c(bytes(32)) == 0x8A9136AA
    assert crc32c(bytes([0xFF] * 32)) == 0x62A8AB43


def _read_records(path):
    records = []
    with open(path, "rb") as f:
        while True:
            header = f.read(8)
            if not header:
                return records
            (length,) = struct.unpack("<Q", header)
            (hcrc,) = struct.unpack("<I", f.read(4))
            assert hcrc == _masked_crc(header)
            data = f.read(length)
            (dcrc,) = struct.unpack("<I", f.read(4))
            assert dcrc == _masked_crc(data)
            records.append(data)


def _decode_fields(buf):
    """Minimal protobuf wire decoder: {field_num: [payloads]}."""
    out = {}
    i = 0
    while i < len(buf):
        key = 0
        shift = 0
        while True:
            b = buf[i]
            i += 1
            key |= (b & 0x7F) << shift
            shift += 7
            if not b & 0x80:
                break
        num, wire = key >> 3, key & 7
        if wire == 0:  # varint
            val = 0
            shift = 0
            while True:
                b = buf[i]
                i += 1
                val |= (b & 0x7F) << shift
                shift += 7
                if not b & 0x80:
                    break
        elif wire == 1:  # 64-bit
            val = buf[i:i + 8]
            i += 8
        elif wire == 2:  # length-delimited
            ln = 0
            shift = 0
            while True:
                b = buf[i]
                i += 1
                ln |= (b & 0x7F) << shift
                shift += 7
                if not b & 0x80:
                    break
            val = buf[i:i + ln]
            i += ln
        elif wire == 5:  # 32-bit
            val = buf[i:i + 4]
            i += 4
        else:
            raise AssertionError(f"unexpected wire type {wire}")
        out.setdefault(num, []).append(val)
    return out


def test_event_file_roundtrip(tmp_path):
    w = EventFileWriter(str(tmp_path))
    w.add_scalar("Training/Loss", 0.25, 1)
    w.add_scalar("Validation/Loss", 0.5, 2)
    w.close()
    (path,) = glob.glob(str(tmp_path / "events.out.tfevents.*"))

    records = _read_records(path)
    assert len(records) == 3
    first = _decode_fields(records[0])
    assert first[3] == [b"brain.Event:2"]

    seen = []
    for rec in records[1:]:
        ev = _decode_fields(rec)
        (wall,) = struct.unpack("<d", ev[1][0])
        assert wall > 1e9  # a real wall time
        step = ev[2][0]
        value = _decode_fields(_decode_fields(ev[5][0])[1][0])
        tag = value[1][0].decode()
        (simple,) = struct.unpack("<f", value[2][0])
        seen.append((tag, simple, step))
    assert seen == [("Training/Loss", 0.25, 1), ("Validation/Loss", 0.5, 2)]


@pytest.mark.slow
def test_real_tensorboard_reader_accepts_file(tmp_path):
    loader_mod = pytest.importorskip(
        "tensorboard.backend.event_processing.event_file_loader"
    )
    w = EventFileWriter(str(tmp_path))
    for step in range(3):
        w.add_scalar("Training/Accuracy", 0.1 * step, step)
    w.close()
    (path,) = glob.glob(str(tmp_path / "events.out.tfevents.*"))
    events = list(loader_mod.EventFileLoader(path).Load())
    # modern TB's loader data-compat-migrates simple_value into tensor form
    scalars = [
        (
            v.tag,
            round(v.tensor.float_val[0] if v.tensor.float_val else v.simple_value, 6),
            e.step,
        )
        for e in events
        for v in e.summary.value
    ]
    assert scalars == [("Training/Accuracy", 0.0, 0),
                       ("Training/Accuracy", 0.1, 1),
                       ("Training/Accuracy", 0.2, 2)]
