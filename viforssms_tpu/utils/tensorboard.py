"""TensorBoard event-file writer (dependency-free).

The reference's observability is TensorBoard-only: `tf.summary.scalar` for the
ELBO and every decomposed log-prob term plus per-coordinate theta histograms
(``AR.py:206-236``, ``..._learn_theta.py:492-597``), scraped offline by
``vis.py:9-30`` with ``EventAccumulator``. Our primary metric stream is JSONL
(utils/metrics.py), but for 1:1 side-by-side comparison in the TensorBoard UI
this module writes real ``events.out.tfevents.*`` files — scalars and
histograms — without importing TensorFlow or the tensorboard package.

Implementation: hand-rolled protobuf encoding of the two tiny messages
involved (``Event`` from tensorflow/core/util/event.proto and
``Summary``/``HistogramProto`` from tensorflow/core/framework/summary.proto)
framed as TFRecords (length + masked-CRC32C framing). Both formats are
stable public wire formats.
"""

from __future__ import annotations

import os
import socket
import struct
import time
from typing import Mapping, Sequence

import numpy as np

# --------------------------------------------------------------------------
# CRC32C (Castagnoli), table-driven; TFRecord uses the "masked" variant.
# --------------------------------------------------------------------------

_CRC_TABLE = []
_POLY = 0x82F63B78
for _i in range(256):
    _c = _i
    for _ in range(8):
        _c = (_c >> 1) ^ _POLY if _c & 1 else _c >> 1
    _CRC_TABLE.append(_c)


def crc32c(data: bytes) -> int:
    crc = 0xFFFFFFFF
    for b in data:
        crc = _CRC_TABLE[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def _masked_crc(data: bytes) -> int:
    crc = crc32c(data)
    return ((crc >> 15 | crc << 17) + 0xA282EAD8) & 0xFFFFFFFF


# --------------------------------------------------------------------------
# Minimal protobuf wire encoding (only what Event/Summary need).
# --------------------------------------------------------------------------


def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        out.append(b | (0x80 if n else 0))
        if not n:
            return bytes(out)


def _key(field: int, wire: int) -> bytes:
    return _varint(field << 3 | wire)


def _f64(field: int, v: float) -> bytes:
    return _key(field, 1) + struct.pack("<d", v)


def _f32(field: int, v: float) -> bytes:
    return _key(field, 5) + struct.pack("<f", v)


def _i64(field: int, v: int) -> bytes:
    return _key(field, 0) + _varint(v & 0xFFFFFFFFFFFFFFFF)


def _bytes(field: int, v: bytes) -> bytes:
    return _key(field, 2) + _varint(len(v)) + v


def _str(field: int, v: str) -> bytes:
    return _bytes(field, v.encode("utf-8"))


def _packed_f64(field: int, vals: Sequence[float]) -> bytes:
    if len(vals) == 0:
        return b""
    return _bytes(field, struct.pack(f"<{len(vals)}d", *vals))


def _histogram_proto(values: np.ndarray) -> bytes:
    """HistogramProto with TensorBoard's standard exponential bucketing."""
    v = np.asarray(values, dtype=np.float64).ravel()
    # Exponential bucket edges (the scheme tf.summary.histogram uses).
    limits = [1e-12]
    while limits[-1] < 1e20:
        limits.append(limits[-1] * 1.1)
    edges = np.array([-x for x in reversed(limits)] + [0.0] + limits)
    counts, _ = np.histogram(v, bins=np.concatenate([[-np.inf], edges]))
    # Trim empty leading/trailing buckets (keeps files small, as TF does).
    nz = np.nonzero(counts)[0]
    if len(nz):
        lo, hi = nz[0], nz[-1] + 1
        counts, edges = counts[lo:hi], edges[lo:hi]
    msg = (
        _f64(1, float(v.min()) if v.size else 0.0)
        + _f64(2, float(v.max()) if v.size else 0.0)
        + _f64(3, float(v.size))
        + _f64(4, float(v.sum()))
        + _f64(5, float((v * v).sum()))
        + _packed_f64(6, edges.tolist())
        + _packed_f64(7, counts.astype(np.float64).tolist())
    )
    return msg


def _summary_value(tag: str, *, simple=None, histo: bytes | None = None) -> bytes:
    msg = _str(1, tag)
    if simple is not None:
        msg += _f32(2, float(simple))
    if histo is not None:
        msg += _bytes(5, histo)
    return msg


def _event(wall_time: float, step: int | None = None, *,
           file_version: str | None = None,
           summary_values: Sequence[bytes] = ()) -> bytes:
    msg = _f64(1, wall_time)
    if step is not None:
        msg += _i64(2, step)
    if file_version is not None:
        msg += _str(3, file_version)
    if summary_values:
        summary = b"".join(_bytes(1, v) for v in summary_values)
        msg += _bytes(5, summary)
    return msg


# --------------------------------------------------------------------------
# Writer
# --------------------------------------------------------------------------


class SummaryWriter:
    """Write scalars/histograms into a TensorBoard-readable event file.

    Drop-in for the observability role of the reference's
    ``tf.summary.FileWriter`` (``AR.py:242-244``): one event file per logdir,
    scalar tags matching utils/metrics.py names, histograms for theta.
    """

    def __init__(self, logdir: str):
        os.makedirs(logdir, exist_ok=True)
        fname = "events.out.tfevents.%010d.%s" % (time.time(), socket.gethostname())
        self._f = open(os.path.join(logdir, fname), "ab")
        self._write_record(_event(time.time(), file_version="brain.Event:2"))

    def _write_record(self, data: bytes):
        header = struct.pack("<Q", len(data))
        self._f.write(header)
        self._f.write(struct.pack("<I", _masked_crc(header)))
        self._f.write(data)
        self._f.write(struct.pack("<I", _masked_crc(data)))

    def add_scalar(self, tag: str, value: float, step: int):
        self._write_record(
            _event(time.time(), step,
                   summary_values=[_summary_value(tag, simple=value)]))

    def add_scalars(self, metrics: Mapping[str, float], step: int):
        vals = [_summary_value(t, simple=v) for t, v in metrics.items()]
        self._write_record(_event(time.time(), step, summary_values=vals))

    def add_histogram(self, tag: str, values, step: int):
        self._write_record(
            _event(time.time(), step,
                   summary_values=[_summary_value(tag, histo=_histogram_proto(np.asarray(values)))]))

    def flush(self):
        self._f.flush()

    def close(self):
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


# --------------------------------------------------------------------------
# Reader (for tests and for scraping our own runs like the reference's vis.py)
# --------------------------------------------------------------------------


def _decode_fields(data: bytes):
    """Yield (field_number, wire_type, value) from one protobuf message."""
    i = 0
    while i < len(data):
        key = 0
        shift = 0
        while True:
            b = data[i]
            i += 1
            key |= (b & 0x7F) << shift
            shift += 7
            if not b & 0x80:
                break
        field, wire = key >> 3, key & 7
        if wire == 0:
            v = 0
            shift = 0
            while True:
                b = data[i]
                i += 1
                v |= (b & 0x7F) << shift
                shift += 7
                if not b & 0x80:
                    break
        elif wire == 1:
            v = data[i:i + 8]
            i += 8
        elif wire == 2:
            ln = 0
            shift = 0
            while True:
                b = data[i]
                i += 1
                ln |= (b & 0x7F) << shift
                shift += 7
                if not b & 0x80:
                    break
            v = data[i:i + ln]
            i += ln
        elif wire == 5:
            v = data[i:i + 4]
            i += 4
        else:  # pragma: no cover
            raise ValueError(f"unsupported wire type {wire}")
        yield field, wire, v


def read_events(path: str, *, verify_crc: bool = True):
    """Parse an event file -> list of dicts.

    Each dict has ``wall_time``, ``step`` and either ``file_version`` or
    ``scalars`` ({tag: value}) / ``histograms`` ({tag: (num, sum)}).
    """
    events = []
    with open(path, "rb") as f:
        while True:
            header = f.read(8)
            if len(header) < 8:
                break
            (length,) = struct.unpack("<Q", header)
            (hcrc,) = struct.unpack("<I", f.read(4))
            data = f.read(length)
            (dcrc,) = struct.unpack("<I", f.read(4))
            if verify_crc and (hcrc != _masked_crc(header) or dcrc != _masked_crc(data)):
                raise ValueError(f"CRC mismatch in {path}")
            ev = {"wall_time": 0.0, "step": 0}
            for field, wire, v in _decode_fields(data):
                if field == 1 and wire == 1:
                    ev["wall_time"] = struct.unpack("<d", v)[0]
                elif field == 2 and wire == 0:
                    ev["step"] = v
                elif field == 3 and wire == 2:
                    ev["file_version"] = v.decode("utf-8")
                elif field == 5 and wire == 2:
                    for sf, sw, sv in _decode_fields(v):
                        if sf != 1 or sw != 2:
                            continue
                        tag, simple, histo = None, None, None
                        for vf, vw, vv in _decode_fields(sv):
                            if vf == 1 and vw == 2:
                                tag = vv.decode("utf-8")
                            elif vf == 2 and vw == 5:
                                simple = struct.unpack("<f", vv)[0]
                            elif vf == 5 and vw == 2:
                                h = {}
                                for hf, hw, hv in _decode_fields(vv):
                                    if hw == 1:
                                        h[hf] = struct.unpack("<d", hv)[0]
                                histo = (h.get(3, 0.0), h.get(4, 0.0))
                        if simple is not None:
                            ev.setdefault("scalars", {})[tag] = simple
                        if histo is not None:
                            ev.setdefault("histograms", {})[tag] = histo
            events.append(ev)
    return events
