"""Native runtime: C++ entropy front-end, built on demand.

The scan loop in entropy.cpp is the performance-critical serial front-end
(the reference's processSos hot loop,
/root/reference/src/jpeg/decoder.zig:1294-1455).  It is compiled lazily
with g++ into libzpix_entropy.so next to this file and loaded via ctypes;
if the toolchain or build is unavailable the Python scan in
codecs/jpeg/decoder.py is used instead (identical semantics, slower).

Set ZPIX_NATIVE=0 to force the Python path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRCS = [
    os.path.join(_HERE, "entropy.cpp"),
    os.path.join(_HERE, "defilter.cpp"),
    os.path.join(_HERE, "qoi.cpp"),
    os.path.join(_HERE, "inflate.cpp"),
]
_SO = os.path.join(_HERE, "libzpix_entropy.so")
_ABI_VERSION = 23

ERR_UNSUPPORTED = 100
ERR_FORMAT = 101

_lock = threading.Lock()
_lib = None
_lib_failed = False


class HuffTableC(ctypes.Structure):
    _fields_ = [
        ("lut", ctypes.c_uint16 * 256),
        ("min_codes", ctypes.c_int32 * 16),
        ("max_codes", ctypes.c_int32 * 16),
        ("vals_indices", ctypes.c_int32 * 16),
        ("vals", ctypes.c_uint8 * 256),
        ("num_codes", ctypes.c_int32),
        # built lazily by the C++ side (ensure_lut16); leave zeroed
        ("lut16_ready", ctypes.c_int32),
        ("lut16", ctypes.c_uint16 * 65536),
    ]


class ScanCompC(ctypes.Structure):
    _fields_ = [
        ("c_index", ctypes.c_int32),
        ("dc_table", ctypes.c_int32),
        ("ac_table", ctypes.c_int32),
        ("h", ctypes.c_int32),
        ("v", ctypes.c_int32),
        ("bh", ctypes.c_int32),
    ]


# Error codes (entropy.cpp).
ERR_EOF = 1
ERR_MISSING_FF00 = 2
ERR_BAD_HUFFMAN = 3
ERR_UNINIT_TABLE = 4
ERR_EXCESSIVE_DC = 5
ERR_BAD_RST = 6
ERR_UNEXPECTED_CODE = 7
ERR_TOO_MANY_COEFFS = 8


def _build() -> bool:
    flags = ["-O3", "-shared", "-fPIC", "-std=c++17", "-lpthread"]
    for extra in (["-march=native"], []):
        try:
            subprocess.run(
                ["g++", *flags, *extra, "-o", _SO, *_SRCS],
                check=True,
                capture_output=True,
                timeout=120,
            )
            return True
        except (subprocess.CalledProcessError, FileNotFoundError, subprocess.TimeoutExpired):
            continue
    return False


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _lib, _lib_failed
    if _lib is not None:
        return _lib
    if _lib_failed or os.environ.get("ZPIX_NATIVE", "1") == "0":
        return None
    with _lock:
        if _lib is not None:
            return _lib
        try:
            if not os.path.exists(_SO) or any(
                os.path.getmtime(_SO) < os.path.getmtime(src) for src in _SRCS
            ):
                if not _build():
                    _lib_failed = True
                    return None
            lib = ctypes.CDLL(_SO)
            if lib.zpix_entropy_abi_version() != _ABI_VERSION:
                if not _build():
                    _lib_failed = True
                    return None
                lib = ctypes.CDLL(_SO)
            lib.zpix_parse_baseline_batch.restype = ctypes.c_int
            lib.zpix_parse_baseline_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int32,
                ctypes.c_int32,
                ctypes.c_int32,
                ctypes.c_int32,
                ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
                ctypes.POINTER(ctypes.POINTER(ctypes.c_int16)),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.c_int32,
            ]
            lib.zpix_parse_baseline.restype = ctypes.c_int
            lib.zpix_parse_baseline.argtypes = [
                ctypes.c_char_p,
                ctypes.c_int64,
                ctypes.c_int32,
                ctypes.c_int32,
                ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
                ctypes.POINTER(ctypes.POINTER(ctypes.c_int16)),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int32,
            ]
            lib.zpix_pack_sparse.restype = ctypes.c_int64
            lib.zpix_pack_sparse.argtypes = [
                ctypes.POINTER(ctypes.c_int32),
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.POINTER(ctypes.c_int16),
                ctypes.c_int64,
            ]
            lib.zpix_qoi_decode.restype = ctypes.c_int
            lib.zpix_qoi_decode.argtypes = [
                ctypes.c_char_p,
                ctypes.c_int64,
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_uint8),
            ]
            lib.zpix_qoi_record_scan.restype = ctypes.c_int
            lib.zpix_qoi_record_scan.argtypes = [
                ctypes.c_char_p,
                ctypes.c_int64,
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_uint32),
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_uint32),
            ]
            lib.zpix_qoi_lane_fill.restype = ctypes.c_int
            lib.zpix_qoi_lane_fill.argtypes = [
                ctypes.c_char_p,
                ctypes.c_int64,
                ctypes.c_int64,
                ctypes.c_int32,
                ctypes.c_int32,
                ctypes.POINTER(ctypes.c_uint32),
                ctypes.POINTER(ctypes.c_int16),
                ctypes.POINTER(ctypes.c_int16),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_uint32),
            ]
            lib.zpix_qoi_lane_fill4.restype = ctypes.c_int
            lib.zpix_qoi_lane_fill4.argtypes = [
                ctypes.c_char_p,
                ctypes.c_int64,
                ctypes.c_int64,
                ctypes.c_int32,
                ctypes.c_int32,
                ctypes.POINTER(ctypes.c_uint8),  # p4 [n_lanes*R*4]
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_uint32),
            ]
            lib.zpix_qoi_lane_scan.restype = ctypes.c_int
            lib.zpix_qoi_lane_scan.argtypes = [
                ctypes.c_char_p,
                ctypes.c_int64,
                ctypes.c_int64,
                ctypes.c_int32,
                ctypes.POINTER(ctypes.c_uint32),
                ctypes.POINTER(ctypes.c_int16),
                ctypes.POINTER(ctypes.c_int16),
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int32),
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_uint32),
            ]
            lib.zpix_qoi_encode.restype = ctypes.c_int64
            lib.zpix_qoi_encode.argtypes = [
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int64,
                ctypes.c_int32,
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int64,
            ]
            lib.zpix_defilter.restype = ctypes.c_int
            lib.zpix_defilter.argtypes = [
                ctypes.c_char_p,
                ctypes.c_int64,
                ctypes.c_int64,
                ctypes.c_int32,
                ctypes.POINTER(ctypes.c_uint8),
            ]
            lib.zpix_defilter_batch.restype = ctypes.c_int
            lib.zpix_defilter_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p),
                ctypes.c_int64,
                ctypes.c_int64,
                ctypes.c_int32,
                ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
                ctypes.c_int32,
                ctypes.c_int32,
            ]
            lib.zpix_decode_scan.restype = ctypes.c_int
            lib.zpix_decode_scan.argtypes = [
                ctypes.c_char_p,  # data
                ctypes.c_int64,  # len
                ctypes.c_int64,  # pos_in
                ctypes.POINTER(HuffTableC),  # huff[8]
                ctypes.POINTER(ScanCompC),  # scan
                ctypes.c_int32,  # n_comp
                ctypes.c_int32,  # mxx
                ctypes.c_int32,  # myy
                ctypes.c_int32,  # width
                ctypes.c_int32,  # height
                ctypes.c_int32,  # restart_interval
                ctypes.c_int32,  # zig_start
                ctypes.c_int32,  # zig_end
                ctypes.c_int32,  # ah
                ctypes.c_int32,  # al
                ctypes.c_int32,  # progressive
                ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),  # coeff_out
                ctypes.POINTER(ctypes.c_uint16),  # eob_run_io
                ctypes.POINTER(ctypes.c_int64),  # pos_out
                ctypes.POINTER(ctypes.c_int32),  # bits_n_out
                ctypes.POINTER(ctypes.c_int32),  # num_unreadable_out
            ]
            lib.zpix_prog_refine_index.restype = ctypes.c_int
            lib.zpix_prog_refine_index.argtypes = [
                ctypes.POINTER(ctypes.c_uint8),  # destuffed scan bytes
                ctypes.c_int64,  # nbytes
                ctypes.POINTER(HuffTableC),  # ac table
                ctypes.POINTER(ctypes.c_uint8),  # nzmask [nblk*64] zigzag
                ctypes.c_int64,  # nblk
                ctypes.c_int32,  # zig_start
                ctypes.c_int32,  # zig_end
                ctypes.c_uint16,  # eob_run_in
                ctypes.POINTER(ctypes.c_int32),  # block_bit_off out
                ctypes.POINTER(ctypes.c_uint8),  # block_eob_entry out
                ctypes.POINTER(ctypes.c_uint16),  # eob_run_out
                ctypes.POINTER(ctypes.c_int64),  # end_bit_out
            ]
            lib.zpix_prog_dc_first_index.restype = ctypes.c_int
            lib.zpix_prog_dc_first_index.argtypes = [
                ctypes.POINTER(ctypes.c_uint8),  # destuffed scan bytes
                ctypes.c_int64,  # nbytes
                ctypes.POINTER(HuffTableC),  # dc tables (CmpTables order)
                ctypes.POINTER(ctypes.c_int32),  # tid_of_slot [bpm]
                ctypes.c_int32,  # bpm
                ctypes.c_int64,  # nblk
                ctypes.POINTER(ctypes.c_int32),  # ends_out [nblk]
                ctypes.POINTER(ctypes.c_int64),  # end_bit_out
            ]
            lib.zpix_prog_ac_first_index.restype = ctypes.c_int
            lib.zpix_prog_ac_first_index.argtypes = [
                ctypes.POINTER(ctypes.c_uint8),  # destuffed scan bytes
                ctypes.c_int64,  # nbytes
                ctypes.POINTER(HuffTableC),  # ac table
                ctypes.c_int32,  # ss
                ctypes.c_int32,  # se
                ctypes.c_int64,  # nvalid
                ctypes.POINTER(ctypes.c_int32),  # starts_out [nvalid]
                ctypes.POINTER(ctypes.c_int32),  # ends_out [nvalid]
                ctypes.POINTER(ctypes.c_uint8),  # hasdata_out [nvalid]
                ctypes.POINTER(ctypes.c_uint8),  # nzmask_io or NULL
                ctypes.POINTER(ctypes.c_int64),  # end_bit_out
            ]
            lib.zpix_baseline_index_scan.restype = ctypes.c_int
            lib.zpix_baseline_index_scan.argtypes = [
                ctypes.POINTER(ctypes.c_uint8),  # destuffed scan bytes
                ctypes.c_int64,  # nbytes
                ctypes.POINTER(HuffTableC),  # huff[8]
                ctypes.POINTER(ctypes.c_int32),  # slot_dc [bpm]
                ctypes.POINTER(ctypes.c_int32),  # slot_ac [bpm]
                ctypes.c_int32,  # bpm
                ctypes.c_int64,  # n_mcu
                ctypes.POINTER(ctypes.c_int32),  # ends_out
                ctypes.POINTER(ctypes.c_int64),  # end_bit_out
            ]
            lib.zpix_inflate_tokens.restype = ctypes.c_int64
            lib.zpix_inflate_tokens.argtypes = [
                ctypes.c_char_p,  # src
                ctypes.c_int64,  # n
                ctypes.c_int32,  # zlib_wrap
                ctypes.POINTER(ctypes.c_int32),  # lens
                ctypes.POINTER(ctypes.c_int32),  # dists
                ctypes.POINTER(ctypes.c_uint8),  # lits
                ctypes.c_int64,  # max_tokens
                ctypes.c_int64,  # max_out
                ctypes.POINTER(ctypes.c_int64),  # out_bytes
            ]
            _lib = lib
            return _lib
        except OSError:
            _lib_failed = True
            return None


def available() -> bool:
    return get_lib() is not None


# ---------------------------------------------------------------- libdeflate
# System libdeflate (2-3x faster zlib decode) for streams whose inflated
# size is known upfront — PNG IDAT qualifies: IHDR fixes it exactly at
# height * (row_bytes + 1).  Falls back to None when absent.

_libdeflate = None
_libdeflate_local = threading.local()


def _get_libdeflate():
    global _libdeflate
    if _libdeflate is None:
        try:
            lib = ctypes.CDLL("libdeflate.so.0")
            lib.libdeflate_alloc_decompressor.restype = ctypes.c_void_p
            lib.libdeflate_zlib_decompress.restype = ctypes.c_int
            lib.libdeflate_zlib_decompress.argtypes = [
                ctypes.c_void_p,
                ctypes.c_char_p,
                ctypes.c_size_t,
                ctypes.c_void_p,
                ctypes.c_size_t,
                ctypes.POINTER(ctypes.c_size_t),
            ]
            _libdeflate = lib
        except OSError:
            _libdeflate = False
    return _libdeflate or None


def zlib_decompress_sized(data: bytes, out_size: int):
    """Inflate a zlib stream of known decompressed size.

    Returns the bytes, or None if libdeflate is unavailable or the size
    does not match exactly (caller falls back to zlib).  Thread-safe: one
    decompressor per thread, and ctypes releases the GIL during the call.
    """
    lib = _get_libdeflate()
    if lib is None or os.environ.get("ZPIX_NATIVE") == "0":
        return None
    dec = getattr(_libdeflate_local, "dec", None)
    if dec is None:
        dec = lib.libdeflate_alloc_decompressor()
        if not dec:
            return None
        _libdeflate_local.dec = dec
    out = ctypes.create_string_buffer(out_size)
    actual = ctypes.c_size_t(0)
    rc = lib.libdeflate_zlib_decompress(
        dec, data, len(data), out, out_size, ctypes.byref(actual)
    )
    if rc != 0 or actual.value != out_size:
        return None
    return out.raw


def inflate_tokens(data: bytes, expected_out: int, zlib_wrap: bool = True):
    """DEFLATE symbol-resolve pass: bitstream -> LZ77 token arrays.

    Returns (lens int32[nt], dists int32[nt], lits uint8[nt], out_bytes)
    or None when the native library is unavailable.  Raises FormatError
    on a malformed stream or when the stream inflates past expected_out
    (PNG's IHDR fixes the exact size, so an overflow is corruption).
    The copy-resolve half runs on device (ops/inflate.py).
    """
    import numpy as np

    from ..errors import FormatError

    lib = get_lib()
    if lib is None:
        return None
    # Every token produces >= 1 byte, so expected_out bounds the count.
    max_tokens = expected_out + 1
    lens = np.empty(max_tokens, np.int32)
    dists = np.empty(max_tokens, np.int32)
    lits = np.empty(max_tokens, np.uint8)
    out_bytes = ctypes.c_int64(0)
    nt = lib.zpix_inflate_tokens(
        data,
        len(data),
        1 if zlib_wrap else 0,
        lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        dists.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        lits.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        max_tokens,
        expected_out,
        ctypes.byref(out_bytes),
    )
    if nt < 0:
        raise FormatError(f"zlib: invalid deflate stream (code {-nt})")
    return lens[:nt], dists[:nt], lits[:nt], out_bytes.value
