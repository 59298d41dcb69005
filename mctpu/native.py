"""ctypes bindings to the native C++ host engine (csrc/mc_host.cpp).

The native engine is the framework's CPU runtime: a multithreaded,
counter-based-RNG Monte Carlo engine playing the role of the reference's
``MonteCarloHost.c`` (performance baseline + independent cross-check), at
native speed instead of serial C / NumPy.

The library auto-builds on first use when ``g++`` is available (a few
seconds); otherwise callers fall back to :mod:`mctpu.reference`.
"""
from __future__ import annotations

import ctypes
import dataclasses
import subprocess
import threading
from pathlib import Path

import numpy as np

from mctpu.types import BasketOption, CvaSpec, VanillaOption

__all__ = [
    "available",
    "build",
    "NativeResult",
    "price_vanilla",
    "price_basket",
    "price_cva",
    "bs_call",
    "cholesky",
]

_PKG_DIR = Path(__file__).resolve().parent
_SRC = _PKG_DIR.parent / "csrc" / "mc_host.cpp"
_LIB_PATH = _PKG_DIR / "_mc_host.so"
_lock = threading.Lock()
_lib = None
_build_error: str | None = None


@dataclasses.dataclass(frozen=True)
class NativeResult:
    price: float
    ci: float
    std_error: float
    n: int
    expected_exposure: np.ndarray | None = None


def build(force: bool = False) -> bool:
    """Compile csrc/mc_host.cpp -> mctpu/_mc_host.so.  True on success."""
    global _build_error
    if _LIB_PATH.exists() and not force:
        if not _SRC.exists() or _LIB_PATH.stat().st_mtime >= _SRC.stat().st_mtime:
            return True
    if not _SRC.exists():
        _build_error = f"source not found: {_SRC}"
        return False
    cmd = ["g++", "-O3", "-std=c++17", "-fPIC", "-shared", "-pthread",
           "-march=native", "-o", str(_LIB_PATH), str(_SRC)]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True, timeout=180)
    except (OSError, subprocess.TimeoutExpired) as e:
        _build_error = f"g++ invocation failed: {e}"
        return False
    if proc.returncode != 0:
        _build_error = proc.stderr[-2000:]
        return False
    return True


def _load():
    global _lib, _build_error
    with _lock:
        if _lib is not None:
            return _lib
        if not build():
            raise RuntimeError(f"native engine unavailable: {_build_error}")
        lib = ctypes.CDLL(str(_LIB_PATH))
        d, i32, i64, u64 = (ctypes.c_double, ctypes.c_int32, ctypes.c_int64,
                            ctypes.c_uint64)
        dp = ctypes.POINTER(ctypes.c_double)
        lib.mc_abi_version.restype = i32
        if lib.mc_abi_version() != 5:
            raise RuntimeError("native engine ABI mismatch")
        lib.mc_vanilla.argtypes = [d, d, d, d, d, i64, u64, i32, i32, dp]
        lib.mc_vanilla_greeks.argtypes = [d, d, d, d, d, i64, u64, i32, i32,
                                          dp]
        lib.mc_basket.argtypes = [dp, dp, dp, dp, dp, i32, d, d, d, i64, u64, dp]
        lib.mc_book.argtypes = [dp, dp, dp, dp, dp, dp, i32, i64, u64, i32,
                                dp]
        lib.mc_cva.argtypes = [d, d, d, d, d, d, d, i32, i64, u64, dp, dp]
        lib.mc_asian.argtypes = [d, d, d, d, d, i32, i32, i64, u64, i32, dp]
        lib.mc_barrier.argtypes = [d, d, d, d, d, d, i32, i32, i64, u64, dp]
        lib.mc_cholesky.argtypes = [dp, i32, dp]
        lib.mc_bs_call.argtypes = [d, d, d, d, d]
        lib.mc_bs_call.restype = d
        _lib = lib
        return _lib


def available() -> bool:
    try:
        _load()
        return True
    except RuntimeError:
        return False


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def price_vanilla(opt: VanillaOption, n_paths: int, seed: int = 0,
                  antithetic: bool = False) -> NativeResult:
    lib = _load()
    out = np.zeros(3)
    lib.mc_vanilla(float(opt.s), float(opt.k), float(opt.r), float(opt.v),
                   float(opt.t), n_paths, seed, int(antithetic),
                   int(getattr(opt, "kind", "call") == "put"), _ptr(out))
    n = n_paths // 2 if antithetic else n_paths
    return NativeResult(out[0], out[1], out[2], n)


GREEK_NAMES = ("price", "delta", "vega", "rho", "theta", "gamma", "vanna",
               "volga")


def vanilla_greeks(opt: VanillaOption, n_paths: int, seed: int = 0,
                   antithetic: bool = False) -> dict:
    """Full native vanilla Greeks surface: ``{name: (mean, se)}``.

    f64 twin of :func:`mctpu.engine.greeks_vanilla` (same pathwise and
    mixed pathwise-LR integrands, independent RNG/implementation) — the
    cross-implementation gate for the Greek estimator formulas.
    """
    lib = _load()
    out = np.zeros(16)
    lib.mc_vanilla_greeks(float(opt.s), float(opt.k), float(opt.r),
                          float(opt.v), float(opt.t), n_paths, seed,
                          int(antithetic),
                          int(getattr(opt, "kind", "call") == "put"),
                          _ptr(out))
    return {name: (out[2 * i], out[2 * i + 1])
            for i, name in enumerate(GREEK_NAMES)}


def price_basket(opt: BasketOption, n_paths: int, seed: int = 0) -> NativeResult:
    lib = _load()
    a = opt.n_assets
    corr = np.ascontiguousarray(np.asarray(opt.corr, np.float64))
    chol = np.zeros((a, a))
    lib.mc_cholesky(_ptr(corr), a, _ptr(chol))
    s0 = np.ascontiguousarray(np.asarray(opt.s, np.float64))
    v = np.ascontiguousarray(np.asarray(opt.v, np.float64))
    w = np.ascontiguousarray(np.asarray(opt.w, np.float64))
    dft = np.ascontiguousarray(np.asarray(opt.d, np.float64))
    out = np.zeros(3)
    lib.mc_basket(_ptr(s0), _ptr(v), _ptr(w), _ptr(chol), _ptr(dft), a,
                  float(opt.k), float(opt.r), float(opt.t), n_paths, seed,
                  _ptr(out))
    if out[0] == -1.0 and out[1] == -1.0:
        raise ValueError("native basket engine supports at most 1024 assets")
    return NativeResult(out[0], out[1], out[2], n_paths)


def price_book(book, n_paths: int, seed: int = 0,
               antithetic: bool = False) -> list:
    """Native f64 twin of :func:`mctpu.engine.price_book` (shared normals,
    per-instrument discounting).  Returns a list of :class:`NativeResult`
    in book order — an independent cross-check of the serving path."""
    lib = _load()
    m = book.n_instruments
    arrs = [np.ascontiguousarray(np.asarray(x, np.float64))
            for x in (book.s, book.k, book.r, book.v, book.t)]
    sgn = np.ascontiguousarray(
        np.asarray([1.0 if kd == "call" else -1.0 for kd in book.kinds],
                   np.float64))
    out = np.zeros(3 * m)
    lib.mc_book(*(_ptr(a) for a in arrs), _ptr(sgn), m, n_paths, seed,
                int(antithetic), _ptr(out))
    n = n_paths // 2 if antithetic else n_paths
    return [NativeResult(out[3 * i], out[3 * i + 1], out[3 * i + 2], n)
            for i in range(m)]


def price_asian(opt, n_paths: int, seed: int = 0,
                antithetic: bool = False) -> NativeResult:
    """Native twin of :func:`mctpu.engine.price_asian` (AsianOption)."""
    lib = _load()
    out = np.zeros(3)
    lib.mc_asian(float(opt.s), float(opt.k), float(opt.r), float(opt.v),
                 float(opt.t), int(opt.n_obs),
                 int(opt.average == "geometric"), n_paths, seed,
                 int(antithetic), _ptr(out))
    if out[0] == -1.0 and out[1] == -1.0:
        raise ValueError("native asian engine: n_obs out of range")
    n = n_paths // 2 if antithetic else n_paths
    return NativeResult(out[0], out[1], out[2], n)


def price_barrier(opt, n_paths: int, seed: int = 0) -> NativeResult:
    """Native twin of :func:`mctpu.engine.price_barrier` (BarrierOption)."""
    lib = _load()
    out = np.zeros(3)
    lib.mc_barrier(float(opt.s), float(opt.k), float(opt.r), float(opt.v),
                   float(opt.t), float(opt.barrier), int(opt.n_obs),
                   int(opt.kind == "up-and-out"), n_paths, seed, _ptr(out))
    if out[0] == -1.0 and out[1] == -1.0:
        raise ValueError("native barrier engine: n_obs out of range")
    return NativeResult(out[0], out[1], out[2], n_paths)


def price_cva(spec: CvaSpec, n_paths: int, seed: int = 0,
              profile: bool = True) -> NativeResult:
    lib = _load()
    o = spec.option
    out = np.zeros(3)
    ee = np.zeros(spec.n_grid) if profile else None
    lib.mc_cva(float(o.s), float(o.k), float(o.r), float(o.v), float(o.t),
               float(spec.intensity), float(spec.lgd), spec.n_grid,
               n_paths, seed, _ptr(out),
               _ptr(ee) if profile else ctypes.POINTER(ctypes.c_double)())
    return NativeResult(out[0], out[1], out[2], n_paths, expected_exposure=ee)


def bs_call(s, k, r, v, t) -> float:
    return float(_load().mc_bs_call(float(s), float(k), float(r), float(v),
                                    float(t)))


def cholesky(corr: np.ndarray) -> np.ndarray:
    lib = _load()
    corr = np.ascontiguousarray(np.asarray(corr, np.float64))
    n = corr.shape[0]
    out = np.zeros((n, n))
    lib.mc_cholesky(_ptr(corr), n, _ptr(out))
    return out


if __name__ == "__main__":
    import sys
    ok = build(force="--force" in sys.argv)
    print("native build:", "ok" if ok else f"FAILED\n{_build_error}")
    sys.exit(0 if ok else 1)
