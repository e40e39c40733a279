"""TensorBoard event-file writer tests (utils/tbevents.py).

The reference's summaries were real ``events.out.tfevents.*`` files from
``tf.summary.FileWriter`` (``model_based_rl.py:339-340``); these tests
prove our dependency-free writer produces the same on-disk format:
TFRecord framing with masked CRC32C, ``brain.Event:2`` version record,
and Event protos TensorBoard can decode (checked with an independent
wire-format reader that validates every CRC)."""

import glob
import os
import struct

import numpy as np

from metrpo_tpu.utils import tbevents
from metrpo_tpu.utils.tbevents import (TBEventWriter, _crc32c, _masked_crc,
                                       read_events, read_tfrecords)


def test_crc32c_known_vectors():
    # Castagnoli CRC test vectors (rfc3720 appendix B.4)
    assert _crc32c(b"") == 0
    assert _crc32c(b"a") == 0xC1D04330
    assert _crc32c(b"123456789") == 0xE3069283
    assert _crc32c(bytes(32)) == 0x8A9136AA


def test_event_file_roundtrip(tmp_path):
    w = TBEventWriter(str(tmp_path))
    w.scalar("loss", 1.5, step=3)
    w.histogram("weights", np.linspace(-1.0, 1.0, 101), step=4)
    w.close()

    files = glob.glob(os.path.join(tmp_path, "events.out.tfevents.*"))
    assert len(files) == 1
    events = read_events(files[0])

    assert events[0]["file_version"] == "brain.Event:2"

    sc = events[1]
    assert sc["step"] == 3
    assert sc["values"][0]["tag"] == "loss"
    np.testing.assert_allclose(sc["values"][0]["simple_value"], 1.5)

    hi = events[2]
    assert hi["step"] == 4
    h = hi["values"][0]["histo"]
    assert hi["values"][0]["tag"] == "weights"
    np.testing.assert_allclose(h["min"], -1.0)
    np.testing.assert_allclose(h["max"], 1.0)
    np.testing.assert_allclose(h["num"], 101)
    np.testing.assert_allclose(h["sum"], 0.0, atol=1e-9)
    assert len(h["bucket"]) == len(h["bucket_limit"])
    np.testing.assert_allclose(sum(h["bucket"]), 101)


def test_crc_validation_catches_corruption(tmp_path):
    w = TBEventWriter(str(tmp_path))
    w.scalar("x", 1.0, step=0)
    w.close()
    path = w.path
    data = bytearray(open(path, "rb").read())
    data[-5] ^= 0xFF  # flip a payload byte of the last record
    with open(path, "wb") as f:
        f.write(data)
    try:
        read_tfrecords(path)
        assert False, "corruption not detected"
    except ValueError as e:
        assert "crc" in str(e)


def test_summary_writer_tees_to_tfevents(tmp_path):
    """SummaryWriter (the production sink) writes BOTH jsonl and tfevents,
    including jitted pytree summaries (no raw leaves leave the device)."""
    import jax.numpy as jnp

    from metrpo_tpu.utils.summaries import SummaryWriter

    with SummaryWriter(str(tmp_path)) as sw:
        sw.scalar("cost", -2.0, step=7)
        sw.histogram("losses", [0.1, 0.2, 0.3], step=7)
        sw.tree("policy/weights", {"w": jnp.ones((4, 4))}, step=7)

    files = glob.glob(os.path.join(tmp_path, "events.out.tfevents.*"))
    assert len(files) == 1
    events = read_events(files[0])
    tags = [v["tag"] for e in events for v in e["values"]]
    assert tags == ["cost", "losses", "policy/weights/w"]
    tree_hist = events[-1]["values"][0]["histo"]
    # 16 ones: min=max=1, num=16, sum=16, sum_squares=16
    np.testing.assert_allclose(tree_hist["min"], 1.0)
    np.testing.assert_allclose(tree_hist["max"], 1.0)
    np.testing.assert_allclose(tree_hist["num"], 16)
    np.testing.assert_allclose(tree_hist["sum"], 16.0, rtol=1e-6)
    np.testing.assert_allclose(tree_hist["sum_squares"], 16.0, rtol=1e-6)
    assert os.path.isfile(tmp_path / "events.jsonl")


def test_record_framing_matches_tfrecord_spec(tmp_path):
    """Byte-level check of the framing TensorBoard's loader expects."""
    w = TBEventWriter(str(tmp_path))
    w.close()
    raw = open(w.path, "rb").read()
    (length,) = struct.unpack("<Q", raw[:8])
    (hcrc,) = struct.unpack("<I", raw[8:12])
    assert hcrc == _masked_crc(raw[:8])
    payload = raw[12:12 + length]
    (dcrc,) = struct.unpack("<I", raw[12 + length:16 + length])
    assert dcrc == _masked_crc(payload)
    assert b"brain.Event:2" in payload
