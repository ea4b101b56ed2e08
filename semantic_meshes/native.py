"""ctypes bridge to the native IO accelerator (native/sens_io.cpp).

Builds the shared library lazily with the in-tree Makefile on first use
(g++/zlib only; no pybind11). All callers must handle `load() is None` and
fall back to the pure-python path — the package works without a compiler.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading

import numpy as np

logger = logging.getLogger("semantic_meshes")

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libsens_io.so")
_lock = threading.Lock()
_lib = None
_tried = False

# keep in sync with struct FrameRecord in native/sens_io.cpp
FRAME_RECORD_DTYPE = np.dtype(
    [
        ("camera_to_world", "<f4", (16,)),
        ("timestamp_color", "<u8"),
        ("timestamp_depth", "<u8"),
        ("color_offset", "<u8"),
        ("color_size", "<u8"),
        ("depth_offset", "<u8"),
        ("depth_size", "<u8"),
    ]
)


class SensHeaderC(ctypes.Structure):
    _fields_ = [
        ("version", ctypes.c_uint32),
        ("intrinsic_color", ctypes.c_float * 16),
        ("extrinsic_color", ctypes.c_float * 16),
        ("intrinsic_depth", ctypes.c_float * 16),
        ("extrinsic_depth", ctypes.c_float * 16),
        ("color_compression", ctypes.c_int32),
        ("depth_compression", ctypes.c_int32),
        ("color_width", ctypes.c_uint32),
        ("color_height", ctypes.c_uint32),
        ("depth_width", ctypes.c_uint32),
        ("depth_height", ctypes.c_uint32),
        ("depth_shift", ctypes.c_float),
        ("num_frames", ctypes.c_uint64),
        ("frames_start", ctypes.c_uint64),
        ("sensor_name", ctypes.c_char * 256),
    ]


def _build():
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR, "-s"],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except (subprocess.SubprocessError, OSError) as e:
        logger.info("native sens_io build failed (%s); using python path", e)
        return False


def load():
    """Return the loaded ctypes library, building it if needed, or None."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.isfile(_LIB_PATH):
            src = os.path.join(_NATIVE_DIR, "sens_io.cpp")
            if not os.path.isfile(src) or not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError as e:
            logger.info("native sens_io load failed (%s)", e)
            return None
        lib.sens_parse_header.restype = ctypes.c_int
        lib.sens_parse_header.argtypes = [
            ctypes.c_char_p, ctypes.c_uint64, ctypes.POINTER(SensHeaderC),
        ]
        lib.sens_index.restype = ctypes.c_int64
        lib.sens_index.argtypes = [
            ctypes.c_char_p, ctypes.c_uint64, ctypes.c_uint64,
            ctypes.c_void_p, ctypes.c_uint64,
        ]
        lib.sens_decode_depth_batch.restype = ctypes.c_int64
        lib.sens_decode_depth_batch.argtypes = [
            ctypes.c_char_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_uint64, ctypes.c_void_p,
        ]
        try:
            lib.colmap_index_images.restype = ctypes.c_int64
            lib.colmap_index_images.argtypes = [
                ctypes.c_char_p, ctypes.c_uint64, ctypes.c_void_p,
                ctypes.c_uint64,
            ]
            colmap_ok = (
                lib.colmap_image_record_size() == COLMAP_IMAGE_DTYPE.itemsize
            )
        except AttributeError:
            colmap_ok = False
        if not colmap_ok:
            logger.info("native colmap indexer unavailable; python fallback")
        # sanity: record layout agreed between C++ and numpy
        if lib.sens_record_size() != FRAME_RECORD_DTYPE.itemsize:
            logger.warning(
                "native sens_io record size mismatch (%d != %d); disabled",
                lib.sens_record_size(), FRAME_RECORD_DTYPE.itemsize,
            )
            return None
        _lib = lib
        return _lib


# keep in sync with struct ColmapImageRecord in native/sens_io.cpp
COLMAP_IMAGE_DTYPE = np.dtype(
    [
        ("image_id", "<i4"),
        ("camera_id", "<i4"),
        ("qvec", "<f8", (4,)),
        ("tvec", "<f8", (3,)),
        ("name_offset", "<u8"),
        ("name_length", "<u8"),
    ]
)


def index_colmap_images(data: bytes):
    """Parse images.bin into a structured array (names decoded separately
    via the offset/length spans). Returns None when native is unavailable."""
    lib = load()
    if lib is None or not hasattr(lib, "colmap_index_images"):
        return None
    if len(data) < 8:
        raise ValueError("images.bin truncated")
    count = int(np.frombuffer(data, "<u8", count=1)[0])
    # count is untrusted: clamp to the most records the file could hold
    # (min 73 bytes each: fixed fields + empty name + point count) so a
    # corrupt header can't trigger a multi-GB allocation
    max_possible = (len(data) - 8) // 73
    if count > max_possible:
        raise ValueError(
            f"images.bin corrupt: claims {count} images, file fits "
            f"at most {max_possible}"
        )
    recs = np.zeros(count, dtype=COLMAP_IMAGE_DTYPE)
    n = lib.colmap_index_images(
        data, len(data), recs.ctypes.data_as(ctypes.c_void_p), count
    )
    if n < 0:
        raise ValueError(f"images.bin parse failed at image {-n - 1}")
    return recs[:n]


def parse_header(data: bytes):
    lib = load()
    if lib is None:
        return None
    hdr = SensHeaderC()
    rc = lib.sens_parse_header(data, len(data), ctypes.byref(hdr))
    if rc != 0:
        raise ValueError(f".sens header parse failed (code {rc})")
    return hdr


def index_frames(data: bytes, frames_start: int, max_frames: int):
    lib = load()
    if lib is None:
        return None
    # max_frames comes from the untrusted header: clamp to the most frames
    # the stream could physically hold (96-byte fixed part per frame)
    max_possible = max(len(data) - int(frames_start), 0) // 96
    if max_frames > max_possible:
        raise ValueError(
            f".sens corrupt: header claims {max_frames} frames, stream "
            f"fits at most {max_possible}"
        )
    records = np.zeros(max_frames, dtype=FRAME_RECORD_DTYPE)
    n = lib.sens_index(
        data, len(data), frames_start,
        records.ctypes.data_as(ctypes.c_void_p), max_frames,
    )
    if n < 0:
        raise ValueError(f".sens frame index failed at frame {-n - 1}")
    return records[:n]


def decode_depth_batch(data: bytes, offsets, sizes, pixels: int):
    """Inflate many zlib uint16 depth frames in parallel -> (N, pixels)."""
    lib = load()
    if lib is None:
        return None
    offsets = np.ascontiguousarray(offsets, np.uint64)
    sizes = np.ascontiguousarray(sizes, np.uint64)
    # defensive bounds check before handing raw offsets to the C decoder
    # (uncompress reads buf[offset : offset + size] unchecked); ordered so
    # no uint64 arithmetic can wrap
    n_bytes = np.uint64(len(data))
    if len(offsets) and (
        (sizes > n_bytes).any() or (offsets > n_bytes - sizes).any()
    ):
        raise ValueError(".sens depth payload spans exceed the stream")
    out = np.empty((len(offsets), pixels), np.uint16)
    failed = lib.sens_decode_depth_batch(
        data,
        offsets.ctypes.data_as(ctypes.c_void_p),
        sizes.ctypes.data_as(ctypes.c_void_p),
        len(offsets), pixels,
        out.ctypes.data_as(ctypes.c_void_p),
    )
    if failed:
        raise ValueError(f"zlib depth decode failed at frame {failed - 1}")
    return out
