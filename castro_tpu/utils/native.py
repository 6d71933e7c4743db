"""Native (C++) runtime components, loaded via ctypes.

The reference's runtime around the GPU kernels is C++ (AMReX); here the
TPU compute path is JAX/XLA/Pallas and the native surface is the I/O
backend: `cpp/castro_io.cpp` provides a threaded asynchronous writer with
CRC32 integrity stamps (the VisMF-async analog). Compiled on first use
with g++; falls back to a synchronous Python writer when no toolchain is
available."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO, "cpp", "castro_io.cpp")

_lib = None
_lock = threading.Lock()
_atexit_registered = False

MAGIC = b"CIO1\x00\x00\x00\x00"


def _so_path():
    """Cache path keyed by the source hash: binaries are never committed
    and a stale cache never shadows edited source."""
    import hashlib

    with open(_SRC, "rb") as f:
        h = hashlib.sha256(f.read()).hexdigest()[:16]
    cache = os.environ.get("CASTRO_TPU_CACHE",
                           os.path.join(os.path.expanduser("~"), ".cache",
                                        "castro_tpu"))
    os.makedirs(cache, exist_ok=True)
    return os.path.join(cache, f"_castro_io_{h}.so")


def _build(so):
    subprocess.run(
        ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", "-pthread",
         _SRC, "-o", so],
        check=True, capture_output=True)


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        try:
            so = _so_path()
            if not os.path.exists(so):
                _build(so)
            lib = ctypes.CDLL(so)
            lib.cio_start.argtypes = [ctypes.c_int]
            lib.cio_submit.argtypes = [ctypes.c_char_p, ctypes.c_void_p,
                                       ctypes.c_uint64]
            lib.cio_submit.restype = ctypes.c_long
            lib.cio_crc32.argtypes = [ctypes.c_void_p, ctypes.c_uint64]
            lib.cio_crc32.restype = ctypes.c_uint32
            lib.cio_pending.restype = ctypes.c_int
            lib.cio_last_error.restype = ctypes.c_int
            _lib = lib
        except Exception:
            _lib = None
        return _lib


class AsyncWriter:
    """Fire-and-forget blob writer (native pool when available)."""

    def __init__(self, nthreads=2):
        self.lib = get_lib()
        if self.lib is not None:
            self.lib.cio_start(nthreads)
            global _atexit_registered
            if not _atexit_registered:
                import atexit

                atexit.register(self.lib.cio_stop)
                _atexit_registered = True

    def submit(self, path: str, data: bytes):
        if self.lib is not None:
            buf = ctypes.create_string_buffer(data, len(data))
            self.lib.cio_submit(path.encode(), buf, len(data))
        else:  # synchronous fallback
            import zlib

            with open(path, "wb") as f:
                n = len(data)
                crc = zlib.crc32(data) & 0xFFFFFFFF
                f.write(MAGIC)
                f.write(n.to_bytes(8, "little"))
                f.write(crc.to_bytes(4, "little"))
                f.write((0).to_bytes(4, "little"))
                f.write(data)

    def wait(self):
        if self.lib is not None:
            self.lib.cio_wait_all()

    def ok(self):
        return self.lib is None or self.lib.cio_last_error() == 0


def read_blob(path: str) -> bytes:
    """Read + verify a CIO1 blob (raises on checksum mismatch)."""
    import zlib

    with open(path, "rb") as f:
        magic = f.read(8)
        if magic != MAGIC:
            raise ValueError(f"{path}: bad magic {magic!r}")
        n = int.from_bytes(f.read(8), "little")
        crc = int.from_bytes(f.read(4), "little")
        f.read(4)
        data = f.read(n)
    if (zlib.crc32(data) & 0xFFFFFFFF) != crc:
        raise ValueError(f"{path}: checksum mismatch (corrupt checkpoint)")
    return data
