"""Dependency-free tfevents writer (tpupose/utils/tensorboard.py).

The reference declares tensorboard dirs but never writes them
(HPE/configs/default.py:102-106); here the capability is real, so it gets
real tests: CRC-32C golden value, write->parse round trip, corruption
detection, and the disabled/no-op mode.
"""

import glob
import os
import struct

import pytest

from tpupose.utils.tensorboard import (SummaryWriter, crc32c, read_scalars)


def test_crc32c_golden():
    # the canonical CRC-32C check vector
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"") == 0


def test_scalar_round_trip(tmp_path):
    d = str(tmp_path / "tb")
    with SummaryWriter(d) as w:
        w.add_scalar("train/loss", 0.5, 1)
        w.add_scalar("train/loss", 0.25, 2)
        w.add_scalars({"pck": 0.9, "mpjpe": 3.0, "skip": "nan-string"},
                      step=3, prefix="eval/")
    files = glob.glob(os.path.join(d, "events.out.tfevents.*"))
    assert len(files) == 1
    got = read_scalars(files[0])
    assert ("train/loss", 0.5, 1) in [(t, v, s) for t, v, s in got]
    tags = {t for t, _, _ in got}
    assert tags == {"train/loss", "eval/pck", "eval/mpjpe"}
    by = {(t, s): v for t, v, s in got}
    assert by[("train/loss", 2)] == 0.25
    assert abs(by[("eval/pck", 3)] - 0.9) < 1e-6


def test_crc_detects_corruption(tmp_path):
    d = str(tmp_path / "tb")
    with SummaryWriter(d) as w:
        w.add_scalar("x", 1.0, 0)
    path = glob.glob(os.path.join(d, "events.out.tfevents.*"))[0]
    data = bytearray(open(path, "rb").read())
    # flip a byte inside the last payload (past the 12-byte frame header)
    data[-6] ^= 0xFF
    with open(path, "wb") as f:
        f.write(data)
    with pytest.raises(ValueError):
        read_scalars(path)


def test_disabled_writer_is_noop(tmp_path):
    w = SummaryWriter("")
    w.add_scalar("x", 1.0, 0)   # must not raise or create files
    w.close()
    assert list(tmp_path.iterdir()) == []


def test_frame_layout_is_tfrecord(tmp_path):
    """First record's framing matches the TFRecord spec byte-for-byte."""
    d = str(tmp_path / "tb")
    SummaryWriter(d).close()
    path = glob.glob(os.path.join(d, "events.out.tfevents.*"))[0]
    raw = open(path, "rb").read()
    (ln,) = struct.unpack_from("<Q", raw, 0)
    payload = raw[12:12 + ln]
    # file_version event: field 3, "brain.Event:2"
    assert b"brain.Event:2" in payload
