"""ctypes bindings for the native host runtime (native/asr_shap_native.cpp).

Loads ``libasr_shap_native.so`` if present (``make -C native``), attempting a
one-time build when a compiler is available; every consumer has a pure-Python
fallback, so the framework works without the library.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import tempfile
from typing import List, Optional, Sequence, Tuple

import numpy as np

logger = logging.getLogger(__name__)

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libasr_shap_native.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR], check=True,
                capture_output=True, timeout=120,
            )
        except Exception:
            return None
    try:
        lib = _register(ctypes.CDLL(_LIB_PATH))
    except AttributeError:
        # Stale prebuilt library missing newer symbols: rebuild, then load a
        # COPY under a fresh path — dlopen dedups by inode, so re-opening the
        # relinked _LIB_PATH would return the already-mapped stale handle.
        try:
            import shutil

            logger.info("native library predates a symbol; rebuilding %s",
                        _LIB_PATH)
            subprocess.run(
                ["make", "-B", "-C", _NATIVE_DIR], check=True,
                capture_output=True, timeout=120,
            )
            fd, fresh = tempfile.mkstemp(suffix=".so", prefix="asr_shap_native_")
            os.close(fd)
            shutil.copy2(_LIB_PATH, fresh)
            lib = _register(ctypes.CDLL(fresh))
            # the mapping stays valid after unlink on POSIX; drop the inode so
            # the temp copy doesn't outlive the process
            try:
                os.unlink(fresh)
            except OSError:
                import atexit

                atexit.register(lambda p=fresh: os.path.exists(p) and os.unlink(p))
        except Exception:
            _lib = None
            return None
    except OSError:
        _lib = None
        return None
    _lib = lib
    return _lib


def _register(lib: ctypes.CDLL) -> ctypes.CDLL:
    """Declare every symbol's signature; raises AttributeError when the
    library predates a symbol (callers rebuild or fall back)."""
    lib.wer_counts.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.batch_wer_counts.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int32, ctypes.POINTER(ctypes.c_int32),
    ]
    lib.write_npy_f32.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64, ctypes.c_int64,
    ]
    lib.write_npy_f32.restype = ctypes.c_int32
    lib.npy_writer_create.argtypes = [ctypes.c_int32, ctypes.c_int64]
    lib.npy_writer_create.restype = ctypes.c_void_p
    lib.npy_writer_submit.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64, ctypes.c_int64,
    ]
    lib.npy_writer_flush.argtypes = [ctypes.c_void_p]
    lib.npy_writer_flush.restype = ctypes.c_int64
    lib.npy_writer_destroy.argtypes = [ctypes.c_void_p]
    return lib


def available() -> bool:
    return _load() is not None


def _i32ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def wer_counts_native(
    ref_ids: Sequence[int], hyp_ids: Sequence[int]
) -> Optional[Tuple[int, int, int, int]]:
    lib = _load()
    if lib is None:
        return None
    ref = np.ascontiguousarray(ref_ids, dtype=np.int32)
    hyp = np.ascontiguousarray(hyp_ids, dtype=np.int32)
    out = np.zeros(4, np.int32)
    lib.wer_counts(_i32ptr(ref), len(ref), _i32ptr(hyp), len(hyp), _i32ptr(out))
    return tuple(int(v) for v in out)


def batch_wer_native(
    refs: List[Sequence[int]], hyps: List[Sequence[int]]
) -> Optional[np.ndarray]:
    """[n, 4] (S, D, I, H) counts per pair, or None without the library."""
    lib = _load()
    if lib is None:
        return None
    ref_lens = np.asarray([len(r) for r in refs], np.int32)
    hyp_lens = np.asarray([len(h) for h in hyps], np.int32)
    refs_c = np.ascontiguousarray(
        np.concatenate([np.asarray(r, np.int32) for r in refs])
        if refs and sum(ref_lens) else np.zeros(0, np.int32)
    )
    hyps_c = np.ascontiguousarray(
        np.concatenate([np.asarray(h, np.int32) for h in hyps])
        if hyps and sum(hyp_lens) else np.zeros(0, np.int32)
    )
    out = np.zeros((len(refs), 4), np.int32)
    lib.batch_wer_counts(
        _i32ptr(refs_c), _i32ptr(ref_lens), _i32ptr(hyps_c), _i32ptr(hyp_lens),
        len(refs), _i32ptr(out),
    )
    return out


def write_npy_f32_native(path: str, array: np.ndarray) -> bool:
    lib = _load()
    if lib is None:
        return False
    a = np.ascontiguousarray(array, dtype=np.float32)
    rows = a.shape[0] if a.ndim >= 1 else 1
    cols = a.shape[1] if a.ndim == 2 else -1
    if a.ndim > 2:
        return False
    rc = lib.write_npy_f32(
        path.encode(), a.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        rows, cols,
    )
    return rc == 0


class NpyWriterPool:
    """Async npy write executor backed by the C++ worker pool: ``submit``
    copies the array into C++-owned memory and returns immediately; writes
    land on worker threads (GIL-free) overlapping device compute; ``flush``
    blocks until everything is on disk and returns the failed-write count.

    Falls back to synchronous np.save when the native library is absent.
    """

    def __init__(self, n_threads: int = 2, max_pending: int = 4):
        """``max_pending`` bounds queued copies (backpressure): submit blocks
        once that many writes are outstanding, capping host memory at
        max_pending buffers."""
        self._lib = _load()
        self._pool = (
            self._lib.npy_writer_create(n_threads, max_pending)
            if self._lib else None
        )

    @property
    def native(self) -> bool:
        return self._pool is not None

    def submit(self, path: str, array: np.ndarray) -> None:
        a = np.ascontiguousarray(array, dtype=np.float32)
        if self._pool is None or a.ndim > 2:
            # keep the tmp+rename atomicity contract resume logic relies on
            # (same pattern as AttributionStore._save_array)
            fd, tmp = tempfile.mkstemp(
                suffix=".npy.tmp", dir=os.path.dirname(path) or "."
            )
            try:
                with os.fdopen(fd, "wb") as fh:
                    np.save(fh, array)
                os.replace(tmp, path)
            except BaseException:
                if os.path.exists(tmp):
                    os.unlink(tmp)
                raise
            return
        rows = a.shape[0] if a.ndim >= 1 else 1
        cols = a.shape[1] if a.ndim == 2 else -1
        self._lib.npy_writer_submit(
            self._pool, path.encode(),
            a.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), rows, cols,
        )

    def flush(self) -> int:
        if self._pool is None:
            return 0
        return int(self._lib.npy_writer_flush(self._pool))

    def close(self) -> None:
        if self._pool is not None:
            self._lib.npy_writer_flush(self._pool)
            self._lib.npy_writer_destroy(self._pool)
            self._pool = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
