"""Dependency-free TensorBoard scalar logging.

The reference logs training scalars/figures to TensorBoard via Lightning
(src/lightning_model/OnePosePlus_lightning_model.py:62-79,141-157) and
optional W&B callbacks; this environment has neither tensorboard nor wandb
installed, so this module writes TensorBoard's on-disk format directly —
TFRecord-framed `Event` protobufs with masked CRC32C checksums — which any
stock TensorBoard install can read. Scalars (`Summary.simple_value`) and
PNG image summaries (`Summary.Image`), covering the reference's scalar and
figure logging.
"""
from __future__ import annotations

import os
import struct
import time
from pathlib import Path

# --- CRC32C (Castagnoli), table-driven ------------------------------------
_POLY = 0x82F63B78
_TABLE = []
for _i in range(256):
    _c = _i
    for _ in range(8):
        _c = (_c >> 1) ^ (_POLY * (_c & 1))
    _TABLE.append(_c)


def _crc32c(data: bytes) -> int:
    crc = 0xFFFFFFFF
    for b in data:
        crc = (crc >> 8) ^ _TABLE[(crc ^ b) & 0xFF]
    return crc ^ 0xFFFFFFFF


def _masked_crc(data: bytes) -> int:
    crc = _crc32c(data)
    return ((crc >> 15) | (crc << 17)) + 0xA282EAD8 & 0xFFFFFFFF


# --- minimal protobuf encoding --------------------------------------------

def _varint(n: int) -> bytes:
    out = b""
    while True:
        b7 = n & 0x7F
        n >>= 7
        if n:
            out += bytes([b7 | 0x80])
        else:
            return out + bytes([b7])


def _field(num: int, wire: int) -> bytes:
    return _varint((num << 3) | wire)


def _len_delim(num: int, payload: bytes) -> bytes:
    return _field(num, 2) + _varint(len(payload)) + payload


def _double(num: int, v: float) -> bytes:
    return _field(num, 1) + struct.pack("<d", v)


def _float(num: int, v: float) -> bytes:
    return _field(num, 5) + struct.pack("<f", v)


def _int64(num: int, v: int) -> bytes:
    return _field(num, 0) + _varint(v & 0xFFFFFFFFFFFFFFFF)


def _event(step: int | None, tag: str | None, value: float | None,
           file_version: str | None = None) -> bytes:
    # Event: 1 wall_time(double), 2 step(int64), 3 file_version(string),
    # 5 summary(Summary); Summary.value: 1 tag(string), 2 simple_value(float)
    ev = _double(1, time.time())
    if step is not None:
        ev += _int64(2, step)
    if file_version is not None:
        ev += _len_delim(3, file_version.encode())
    if tag is not None:
        sval = _len_delim(1, tag.encode()) + _float(2, float(value))
        ev += _len_delim(5, _len_delim(1, sval))
    return ev


class SummaryWriter:
    """Append-only TensorBoard event file writer (scalars)."""

    def __init__(self, logdir):
        Path(logdir).mkdir(parents=True, exist_ok=True)
        fname = f"events.out.tfevents.{int(time.time())}.{os.getpid()}"
        self._f = open(Path(logdir) / fname, "ab")
        self._write(_event(None, None, None, file_version="brain.Event:2"))

    def _write(self, payload: bytes) -> None:
        header = struct.pack("<Q", len(payload))
        self._f.write(header)
        self._f.write(struct.pack("<I", _masked_crc(header)))
        self._f.write(payload)
        self._f.write(struct.pack("<I", _masked_crc(payload)))

    def add_scalar(self, tag: str, value: float, step: int) -> None:
        self._write(_event(int(step), tag, float(value)))

    def add_image(self, tag: str, image, step: int) -> None:
        """Log an image summary. `image` is [H, W] or [H, W, {1,3,4}],
        uint8 or float in [0, 1] (grayscale inputs render as grayscale)."""
        import cv2
        import numpy as np

        img = np.asarray(image)
        if img.dtype != np.uint8:
            if np.issubdtype(img.dtype, np.integer):
                # integer image in 0..255 range (e.g. int32 from matplotlib
                # or accumulation) — [0,1] scaling would render it binary
                img = np.clip(img, 0, 255).astype(np.uint8)
            else:
                img = (np.clip(img, 0.0, 1.0) * 255).astype(np.uint8)
        if img.ndim == 2:
            img = img[:, :, None]
        h, w, c = img.shape
        # cv2 encodes BGR(A); our convention is RGB(A)
        bgr = img if c == 1 else img[:, :, [2, 1, 0] + ([3] if c == 4 else [])]
        ok, png = cv2.imencode(".png", bgr)
        if not ok:  # pragma: no cover - imencode failure is environmental
            raise RuntimeError("PNG encode failed")
        # Summary.Image: 1 height, 2 width, 3 colorspace, 4 encoded bytes
        im_msg = (_int64(1, h) + _int64(2, w) + _int64(3, c)
                  + _len_delim(4, png.tobytes()))
        sval = _len_delim(1, tag.encode()) + _len_delim(4, im_msg)
        ev = (_double(1, time.time()) + _int64(2, int(step))
              + _len_delim(5, _len_delim(1, sval)))
        self._write(ev)

    def add_scalars(self, scalars: dict, step: int, prefix: str = "") -> None:
        for k, v in scalars.items():
            try:
                self.add_scalar(f"{prefix}{k}", float(v), step)
            except (TypeError, ValueError):
                continue

    def flush(self) -> None:
        self._f.flush()

    def close(self) -> None:
        self._f.close()
