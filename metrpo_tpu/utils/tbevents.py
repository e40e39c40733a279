"""TensorBoard-readable event files, dependency-free.

The reference wrote summaries through two ``tf.summary.FileWriter``s at
``tf_logs/{train,val}`` (``model_based_rl.py:339-340``), producing
``events.out.tfevents.*`` files TensorBoard tails. Round 1 replaced that
with JSONL (``utils/summaries.py``) — a documented format deviation.
This module closes it: a minimal, pure-python writer for the actual
TensorBoard on-disk format, so ``tensorboard --logdir tf_logs`` works on
our runs with zero extra dependencies.

Format (both layers hand-encoded here):

* **TFRecord framing** — each record is
  ``uint64 len | masked_crc32c(len) | data | masked_crc32c(data)``
  with CRC32-Castagnoli and TensorFlow's mask
  ``((crc >> 15 | crc << 17) + 0xa282ead8) & 0xffffffff``.
* **Event protobuf** (``tensorflow/core/util/event.proto``) — fields
  wall_time=1 (double), step=2 (int64), file_version=3 (string),
  summary=5 (Summary). ``Summary.Value``: tag=1, simple_value=2 (float),
  histo=5 (HistogramProto: min=1, max=2, num=3, sum=4, sum_squares=5,
  bucket_limit=6 packed double, bucket=7 packed double).
"""

from __future__ import annotations

import os
import socket
import struct
import threading
import time

import numpy as np

# ---------------------------------------------------------------------------
# CRC32-Castagnoli (polynomial 0x1EDC6F41, reflected 0x82F63B78)

_CRC_TABLE = []
for _i in range(256):
    _c = _i
    for _ in range(8):
        _c = (_c >> 1) ^ 0x82F63B78 if _c & 1 else _c >> 1
    _CRC_TABLE.append(_c)


def _crc32c(data: bytes) -> int:
    crc = 0xFFFFFFFF
    for b in data:
        crc = _CRC_TABLE[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def _masked_crc(data: bytes) -> int:
    crc = _crc32c(data)
    return (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF


# ---------------------------------------------------------------------------
# Minimal protobuf wire encoding

def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        bits = n & 0x7F
        n >>= 7
        if n:
            out.append(bits | 0x80)
        else:
            out.append(bits)
            return bytes(out)


def _key(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _double(field: int, v: float) -> bytes:
    return _key(field, 1) + struct.pack("<d", v)


def _float(field: int, v: float) -> bytes:
    return _key(field, 5) + struct.pack("<f", v)


def _int64(field: int, v: int) -> bytes:
    return _key(field, 0) + _varint(v & 0xFFFFFFFFFFFFFFFF)


def _bytes(field: int, v: bytes) -> bytes:
    return _key(field, 2) + _varint(len(v)) + v


def _packed_doubles(field: int, vals) -> bytes:
    payload = b"".join(struct.pack("<d", float(v)) for v in vals)
    return _bytes(field, payload)


def _histogram_proto(values: np.ndarray, counts: np.ndarray,
                     edges: np.ndarray) -> bytes:
    # HistogramProto buckets: bucket_limit[i] is the upper edge of bucket i;
    # TensorBoard expects len(bucket) == len(bucket_limit).
    return b"".join([
        _double(1, float(values.min())),
        _double(2, float(values.max())),
        _double(3, float(values.size)),
        _double(4, float(values.sum())),
        _double(5, float((values * values).sum())),
        _packed_doubles(6, edges[1:]),
        _packed_doubles(7, counts),
    ])


def _event(step: int, summary: bytes | None = None,
           file_version: str | None = None,
           wall_time: float | None = None) -> bytes:
    parts = [_double(1, time.time() if wall_time is None else wall_time)]
    if step is not None:
        parts.append(_int64(2, int(step)))
    if file_version is not None:
        parts.append(_bytes(3, file_version.encode()))
    if summary is not None:
        parts.append(_bytes(5, summary))
    return b"".join(parts)


class TBEventWriter:
    """Append-only ``events.out.tfevents.*`` writer (FileWriter analog)."""

    def __init__(self, logdir: str):
        os.makedirs(logdir, exist_ok=True)
        fname = "events.out.tfevents.%010d.%s" % (
            int(time.time()), socket.gethostname())
        self._path = os.path.join(logdir, fname)
        self._f = open(self._path, "ab")
        self._lock = threading.Lock()
        self._record(_event(step=None, file_version="brain.Event:2"))

    @property
    def path(self) -> str:
        return self._path

    def _record(self, data: bytes):
        header = struct.pack("<Q", len(data))
        with self._lock:
            self._f.write(header)
            self._f.write(struct.pack("<I", _masked_crc(header)))
            self._f.write(data)
            self._f.write(struct.pack("<I", _masked_crc(data)))

    def scalar(self, tag: str, value: float, step: int):
        val = _bytes(1, _bytes(1, tag.encode()) + _float(2, float(value)))
        self._record(_event(step, summary=val))

    def histogram(self, tag: str, values, step: int,
                  counts=None, edges=None):
        values = np.asarray(values, np.float64).ravel()
        if values.size == 0:
            return
        if counts is None or edges is None:
            counts, edges = np.histogram(values, bins=min(20, values.size))
        val = _bytes(1, _bytes(1, tag.encode()) +
                     _bytes(5, _histogram_proto(values, np.asarray(counts),
                                                np.asarray(edges))))
        self._record(_event(step, summary=val))

    def _record_histogram_from_stats(self, tag: str, step: int, *,
                                     vmin: float, vmax: float, num: float,
                                     mean: float, std: float,
                                     counts, edges):
        """HistogramProto from precomputed bucket stats (the pytree path:
        raw leaves never leave the device, only jitted summaries do)."""
        counts = np.asarray(counts, np.float64)
        edges = np.asarray(edges, np.float64)
        proto = b"".join([
            _double(1, vmin),
            _double(2, vmax),
            _double(3, num),
            _double(4, mean * num),
            _double(5, (std * std + mean * mean) * num),
            _packed_doubles(6, edges[1:]),
            _packed_doubles(7, counts),
        ])
        val = _bytes(1, _bytes(1, tag.encode()) + _bytes(5, proto))
        self._record(_event(step, summary=val))

    def flush(self):
        with self._lock:
            self._f.flush()

    def close(self):
        with self._lock:
            self._f.close()


# ---------------------------------------------------------------------------
# Reader (tests + offline inspection; validates CRCs like TB does)

def read_tfrecords(path: str) -> list[bytes]:
    """Return the raw protobuf payloads, verifying both CRCs per record."""
    out = []
    with open(path, "rb") as f:
        while True:
            header = f.read(8)
            if len(header) < 8:
                break
            (hcrc,) = struct.unpack("<I", f.read(4))
            if hcrc != _masked_crc(header):
                raise ValueError(f"bad header crc in {path}")
            (length,) = struct.unpack("<Q", header)
            data = f.read(length)
            (dcrc,) = struct.unpack("<I", f.read(4))
            if dcrc != _masked_crc(data):
                raise ValueError(f"bad data crc in {path}")
            out.append(data)
    return out


def _decode_fields(buf: bytes) -> list[tuple[int, int, bytes | int]]:
    """Flat decode of one protobuf message: [(field, wire, value)]."""
    fields, i = [], 0
    while i < len(buf):
        key, shift = 0, 0
        while True:
            b = buf[i]
            i += 1
            key |= (b & 0x7F) << shift
            shift += 7
            if not b & 0x80:
                break
        field, wire = key >> 3, key & 7
        if wire == 0:
            v, shift = 0, 0
            while True:
                b = buf[i]
                i += 1
                v |= (b & 0x7F) << shift
                shift += 7
                if not b & 0x80:
                    break
            fields.append((field, wire, v))
        elif wire == 1:
            fields.append((field, wire, buf[i:i + 8]))
            i += 8
        elif wire == 5:
            fields.append((field, wire, buf[i:i + 4]))
            i += 4
        elif wire == 2:
            ln, shift = 0, 0
            while True:
                b = buf[i]
                i += 1
                ln |= (b & 0x7F) << shift
                shift += 7
                if not b & 0x80:
                    break
            fields.append((field, wire, buf[i:i + ln]))
            i += ln
        else:
            raise ValueError(f"unsupported wire type {wire}")
    return fields


def read_events(path: str) -> list[dict]:
    """Decode scalar/histogram events back to dicts (test oracle)."""
    events = []
    for rec in read_tfrecords(path):
        ev = {"values": []}
        for field, wire, v in _decode_fields(rec):
            if field == 1 and wire == 1:
                ev["wall_time"] = struct.unpack("<d", v)[0]
            elif field == 2 and wire == 0:
                ev["step"] = v
            elif field == 3 and wire == 2:
                ev["file_version"] = v.decode()
            elif field == 5 and wire == 2:
                for f2, w2, val in _decode_fields(v):
                    if f2 == 1 and w2 == 2:
                        entry = {}
                        for f3, w3, vv in _decode_fields(val):
                            if f3 == 1 and w3 == 2:
                                entry["tag"] = vv.decode()
                            elif f3 == 2 and w3 == 5:
                                entry["simple_value"] = struct.unpack(
                                    "<f", vv)[0]
                            elif f3 == 5 and w3 == 2:
                                histo = {}
                                for f4, w4, hv in _decode_fields(vv):
                                    if w4 == 1:
                                        name = {1: "min", 2: "max", 3: "num",
                                                4: "sum", 5: "sum_squares"}.get(f4)
                                        if name:
                                            histo[name] = struct.unpack(
                                                "<d", hv)[0]
                                    elif w4 == 2 and f4 in (6, 7):
                                        arr = np.frombuffer(hv, "<f8").tolist()
                                        histo["bucket_limit" if f4 == 6
                                              else "bucket"] = arr
                                entry["histo"] = histo
                        ev["values"].append(entry)
        events.append(ev)
    return events
