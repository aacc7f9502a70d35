"""Native host runtime: C++ board search (ctypes bindings).

The dense pipeline stages run on TPU; the irregular board search can run
either fully on-device (ops/search.py) or on the host through this
native library — the hybrid mode trades one tiny device->host transfer
of the saddle arrays for a sequential search that matches the reference
algorithm step for step (see native/search.cpp).
"""

from __future__ import annotations

import ctypes
import functools
import os
import subprocess
from pathlib import Path

import numpy as np

_DIR = Path(__file__).resolve().parent
_SRC = _DIR / "search.cpp"
_LIB = _DIR / "libagsearch.so"

# -march=native by default (measured ~14 % on the hot search paths:
# iphone no-board pass 2.022 -> 1.732 ms/frame, tools/profile_search.py
# A/B round 5). Safe for a .so shared across hosts (NFS checkout,
# container image): the build stamp includes a host-ISA signature, so a
# different host sees a stamp mismatch and rebuilds with ITS OWN flags
# instead of SIGILLing on foreign vector instructions.
# -ffp-contract=off pins the numerics: the baseline x86-64 build has no
# FMA instruction, so contraction was impossible before; allowing the
# compiler to fuse a*b+c under -march=native would change rounding on
# razor-edge reference-parity gates. AG_NATIVE_MARCH overrides
# ("portable" disables -march entirely).
_CFLAGS = ["-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
           "-ffp-contract=off"]


def _host_isa_signature() -> str:
    """Stable signature of this host's ISA (CPU flags), so ISA-specific
    builds are never reused on a host that cannot run them."""
    try:
        import hashlib

        for line in Path("/proc/cpuinfo").read_text().splitlines():
            if line.startswith("flags"):
                return hashlib.sha256(line.encode()).hexdigest()[:16]
    except OSError:
        pass
    import platform

    return platform.machine()


def build(force: bool = False) -> Path:
    """Compile the native library if missing or stale (source newer, or
    built with different flags).

    ISA-specific builds live in ISA-suffixed files
    (``libagsearch.<sig>.so`` + matching stamp), so hosts with
    different vector ISAs sharing one checkout (NFS, container image)
    each keep their own artifact instead of rebuild-thrashing or —
    worse — dlopening a foreign-ISA .so. Artifacts are written to a
    temp file and os.replace()d, so a concurrent reader never maps a
    half-written library."""
    cflags = list(_CFLAGS)
    march = os.environ.get("AG_NATIVE_MARCH", "native")
    native_isa = bool(march) and march != "portable"
    if native_isa:
        cflags.append(f"-march={march}")
        sig = _host_isa_signature()
        lib = _DIR / f"libagsearch.{sig}.so"
        stamp = _DIR / f".build_flags.{sig}"
        # the stamp records the REQUEST (flags + ISA), not the outcome:
        # a -march compile that falls back to portable must not retry
        # the failing compile on every import
        flags = " ".join(cflags) + " isa:" + sig
    else:
        lib = _LIB
        stamp = _DIR / ".build_flags"
        flags = " ".join(cflags)
    stale = (
        force
        or not lib.exists()
        or lib.stat().st_mtime < _SRC.stat().st_mtime
        or not stamp.exists()
        or stamp.read_text() != flags
    )
    if stale:
        tmp = lib.with_suffix(f".tmp{os.getpid()}.so")
        try:
            try:
                subprocess.run(
                    ["g++", *cflags, str(_SRC), "-o", str(tmp)],
                    check=True,
                    capture_output=True,
                )
            except subprocess.CalledProcessError:
                if not native_isa:
                    raise
                # toolchain rejects this -march: fall back portable
                # (same stamp — see above)
                subprocess.run(
                    ["g++", *_CFLAGS, str(_SRC), "-o", str(tmp)],
                    check=True,
                    capture_output=True,
                )
            os.replace(tmp, lib)
        finally:
            tmp.unlink(missing_ok=True)
        stamp.write_text(flags)
    return lib


@functools.lru_cache(maxsize=None)
def _lib() -> ctypes.CDLL:
    lib = ctypes.CDLL(str(build()))
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    lib.ag_find_board.restype = ctypes.c_int
    lib.ag_find_board.argtypes = [
        f32p, f32p, f32p, u8p, ctypes.c_int, ctypes.c_float,
        ctypes.c_int, ctypes.c_int, i32p, ctypes.c_int,
    ]
    lib.ag_find_board_batch.restype = None
    lib.ag_find_board_batch.argtypes = [
        f32p, f32p, f32p, u8p, ctypes.c_int, ctypes.c_int, ctypes.c_float,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, i32p, i32p, ctypes.c_int,
    ]
    lib.ag_is_valid_quad.restype = ctypes.c_int
    lib.ag_is_valid_quad.argtypes = [f32p]
    return lib


def is_valid_quad(xyt: np.ndarray) -> bool:
    """Test-only: quad validity of four (x, y, theta_deg) saddles."""
    return bool(
        _lib().ag_is_valid_quad(
            np.ascontiguousarray(xyt, np.float32).reshape(12)
        )
    )


def find_board(
    px: np.ndarray,
    py: np.ndarray,
    theta: np.ndarray,
    alive: np.ndarray,
    spacing_ratio: float = 0.3,
    max_seeds: int = 30,
    early_exit_score: int = 36,
    cap: int = 169,
) -> np.ndarray:
    """One board-search pass; returns (count, 4) int32 tag quads."""
    n = px.shape[0]
    out = np.zeros((cap, 4), np.int32)
    cnt = _lib().ag_find_board(
        np.ascontiguousarray(px, np.float32),
        np.ascontiguousarray(py, np.float32),
        np.ascontiguousarray(theta, np.float32),
        np.ascontiguousarray(alive, np.uint8),
        n, spacing_ratio, max_seeds, early_exit_score, out, cap,
    )
    return out[:cnt]


def find_board_batch(
    px: np.ndarray,  # (B, N)
    py: np.ndarray,
    theta: np.ndarray,
    alive: np.ndarray,  # (B, N) uint8
    spacing_ratio: float = 0.3,
    max_seeds: int = 30,
    early_exit_score: int = 36,
    cap: int = 169,
    num_threads: int | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Batched pass over B independent frames, parallelized across host
    threads (``num_threads`` defaults to AG_SEARCH_THREADS or all cores);
    returns (quads (B, cap, 4) int32, counts (B,) int32)."""
    b, n = px.shape
    quads = np.zeros((b, cap, 4), np.int32)
    counts = np.zeros(b, np.int32)
    if num_threads is None:
        num_threads = int(os.environ.get("AG_SEARCH_THREADS", "0"))
    _lib().ag_find_board_batch(
        np.ascontiguousarray(px, np.float32),
        np.ascontiguousarray(py, np.float32),
        np.ascontiguousarray(theta, np.float32),
        np.ascontiguousarray(alive, np.uint8),
        b, n, spacing_ratio, max_seeds, early_exit_score, num_threads,
        quads, counts, cap,
    )
    return quads, counts
