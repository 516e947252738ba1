"""Observability surface: TensorBoard event writer + experiment provenance
(reference TB logger launch.py:212-227, code/config snapshot callbacks
threestudio/utils/callbacks.py:60-111)."""

import os
import struct
import zipfile

import numpy as np


def test_tb_writer_roundtrip(tmp_path):
    from animate3d_tpu.utils.tb_writer import TBWriter, read_events

    w = TBWriter(str(tmp_path))
    w.scalar("loss", 0.5, step=1)
    w.scalar("loss", 0.25, step=2)
    w.scalar("lr", 1e-3, step=2)
    w.close()

    events = read_events(w.path)
    assert (1, "loss") in [(s, t) for s, t, _ in events]
    by_key = {(s, t): v for s, t, v in events}
    assert abs(by_key[(1, "loss")] - 0.5) < 1e-7
    assert abs(by_key[(2, "loss")] - 0.25) < 1e-7
    assert abs(by_key[(2, "lr")] - 1e-3) < 1e-9


def test_tb_crc32c_known_values():
    """crc32c against published test vectors (RFC 3720 / common suites)."""
    from animate3d_tpu.utils.tb_writer import crc32c

    assert crc32c(b"") == 0
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"\x00" * 32) == 0x8A9136AA


def test_tb_record_framing(tmp_path):
    """First record is the brain.Event:2 file-version header with valid
    masked crcs (what stock TensorBoard checks before reading)."""
    from animate3d_tpu.utils.tb_writer import TBWriter, _masked_crc

    w = TBWriter(str(tmp_path))
    w.scalar("x", 1.0, step=0)
    w.close()
    raw = open(w.path, "rb").read()
    (length,) = struct.unpack("<Q", raw[:8])
    (hcrc,) = struct.unpack("<I", raw[8:12])
    assert hcrc == _masked_crc(raw[:8])
    payload = raw[12:12 + length]
    (pcrc,) = struct.unpack("<I", raw[12 + length:16 + length])
    assert pcrc == _masked_crc(payload)
    assert b"brain.Event:2" in payload


def test_metrics_logger_writes_tb(tmp_path):
    from animate3d_tpu.utils.logging import MetricsLogger
    from animate3d_tpu.utils.tb_writer import read_events

    logger = MetricsLogger(str(tmp_path / "metrics.jsonl"))
    logger.log(0, {"loss": 1.0, "note": "text-skipped"})
    logger.log(1, {"loss": 0.5})

    tb_dir = tmp_path / "tb"
    files = [f for f in os.listdir(tb_dir) if f.startswith("events.out")]
    assert len(files) == 1
    events = read_events(str(tb_dir / files[0]))
    tags = {t for _, t, _ in events}
    assert tags == {"loss"}  # strings go to JSONL only
    assert len(events) == 2


def test_launch_provenance_snapshot(tmp_path):
    import argparse

    from animate3d_tpu.cli.launch import snapshot_provenance

    snapshot_provenance(str(tmp_path), argparse.Namespace())
    assert os.path.exists(tmp_path / "cmd.txt")
    with zipfile.ZipFile(tmp_path / "code_snapshot.zip") as z:
        names = z.namelist()
    assert any(n.endswith("systems/animate3d.py") for n in names)
    assert any(n.endswith("ops/rasterize.py") for n in names)
    assert not any("__pycache__" in n for n in names)
