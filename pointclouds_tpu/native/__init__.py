"""ctypes bindings for the native I/O runtime (libpcio.so).

Auto-builds the shared library on first import if a toolchain is available;
callers fall back to pure-numpy parsing when the library can't be loaded
(`available` is False). See pcio.cpp for what's implemented.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libpcio.so")

# Shared load/build memo, keyed by .so path. A key present with value
# None means the build or load already failed — memoized so a missing
# toolchain doesn't re-run `make` on every call (e.g. once per new
# PointCloud's first single-point query).
_libs: dict = {}


def _build_and_load(so_path: str, make_target: str):
    """Load `so_path`, building it via `make <make_target>` first if
    absent. Returns the raw ctypes.CDLL (no prototypes set) or None;
    both outcomes are memoized."""
    if so_path in _libs:
        return _libs[so_path]
    lib = None
    try:
        if not os.path.exists(so_path):
            subprocess.run(
                ["make", "-C", _DIR, make_target],
                check=True,
                capture_output=True,
                timeout=120,
            )
        lib = ctypes.CDLL(so_path)
    except Exception:
        lib = None
    _libs[so_path] = lib
    return lib


_configured: set = set()


def _load():
    lib = _build_and_load(_SO, "libpcio.so")
    if lib is None or _SO in _configured:
        return lib
    _configured.add(_SO)

    lib.pcio_decode_las.restype = ctypes.c_int
    lib.pcio_decode_las.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int64,
        ctypes.c_int32,
        ctypes.c_double,
        ctypes.c_double,
        ctypes.c_double,
        ctypes.c_double,
        ctypes.c_double,
        ctypes.c_double,
        ctypes.c_void_p,
        ctypes.c_void_p,
    ]
    lib.pcio_parse_ascii_xyz.restype = ctypes.c_int64
    lib.pcio_parse_ascii_xyz.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int64,
        ctypes.c_void_p,
        ctypes.c_int64,
    ]
    lib.pcio_gather_xyz_f32.restype = None
    lib.pcio_gather_xyz_f32.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int64,
        ctypes.c_int32,
        ctypes.c_int32,
        ctypes.c_int32,
        ctypes.c_int32,
        ctypes.c_void_p,
    ]
    return lib


def get_lib():
    return _load()


def available() -> bool:
    return _load() is not None


def decode_las(buf: bytes, n: int, stride: int, scale, offset):
    """Returns (xyz f32[n,3], intensity f32[n], any_nonzero_intensity)."""
    import numpy as np

    lib = _load()
    if lib is None:
        return None
    xyz = np.empty((n, 3), np.float32)
    inten = np.empty((n,), np.float32)
    any_i = lib.pcio_decode_las(
        buf,
        n,
        stride,
        float(scale[0]),
        float(scale[1]),
        float(scale[2]),
        float(offset[0]),
        float(offset[1]),
        float(offset[2]),
        xyz.ctypes.data_as(ctypes.c_void_p),
        inten.ctypes.data_as(ctypes.c_void_p),
    )
    return xyz, inten, bool(any_i)


def parse_ascii_xyz(text: bytes, max_points: int):
    """Returns xyz f32[count, 3] or None if the library is unavailable."""
    import numpy as np

    lib = _load()
    if lib is None:
        return None
    out = np.empty((max_points, 3), np.float32)
    count = lib.pcio_parse_ascii_xyz(
        text, len(text), out.ctypes.data_as(ctypes.c_void_p), max_points
    )
    return out[:count].copy()


def gather_xyz_f32(buf: bytes, n: int, stride: int, off_x, off_y, off_z):
    """Returns xyz f32[n,3] extracted from packed records, or None."""
    import numpy as np

    lib = _load()
    if lib is None:
        return None
    out = np.empty((n, 3), np.float32)
    lib.pcio_gather_xyz_f32(
        buf,
        n,
        stride,
        off_x,
        off_y,
        off_z,
        out.ctypes.data_as(ctypes.c_void_p),
    )
    return out


# ── Native host cell index (libpcindex.so) ───────────────────────────────────

_SO_IDX = os.path.join(_DIR, "libpcindex.so")


def _load_index():
    lib = _build_and_load(_SO_IDX, "libpcindex.so")
    if lib is None or _SO_IDX in _configured:
        return lib
    _configured.add(_SO_IDX)
    lib.pcidx_build.restype = ctypes.c_void_p
    lib.pcidx_build.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
    ]
    lib.pcidx_nvalid.restype = ctypes.c_int64
    lib.pcidx_nvalid.argtypes = [ctypes.c_void_p]
    lib.pcidx_free.restype = None
    lib.pcidx_free.argtypes = [ctypes.c_void_p]
    lib.pcidx_knn.restype = ctypes.c_int64
    lib.pcidx_knn.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
        ctypes.c_void_p, ctypes.c_void_p,
    ]
    lib.pcidx_radius.restype = ctypes.c_int64
    lib.pcidx_radius.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_double,
        ctypes.c_void_p, ctypes.c_int64,
    ]
    lib.pcidx_knn_batch.restype = None
    lib.pcidx_knn_batch.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
    ]
    lib.pcidx_cluster_epilogue.restype = ctypes.c_int64
    lib.pcidx_cluster_epilogue.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_void_p, ctypes.c_void_p,
    ]
    return lib


class NativeCellIndex:
    """ctypes handle for the C++ build-once host index (pcindex.cpp).
    Same exact semantics as spatial/hostindex.HostCellIndex; ~100x less
    per-query interpreter overhead. Use `create_index`; returns None when
    the toolchain/library is unavailable (callers keep the numpy path).

    Per-query scratch (query vector + output arrays + their ctypes
    pointers) is THREAD-LOCAL and reused across calls: the allocations
    and `data_as` marshaling cost ~15 us/query, ~2x the C query itself.
    Results are copied out of the scratch, so returned arrays stay valid
    across subsequent queries."""

    def __init__(self, lib, handle):
        import threading

        self._lib = lib
        self._h = handle
        self._tls = threading.local()

    def __del__(self):
        try:
            self._lib.pcidx_free(self._h)
        except Exception:
            pass

    def nvalid(self) -> int:
        return int(self._lib.pcidx_nvalid(self._h))

    def _scratch(self, k: int):
        import numpy as np

        tls = self._tls
        s = getattr(tls, "s", None)
        if s is None or s[1].shape[0] < k:
            qa = np.empty((3,), np.float64)
            rows = np.empty((max(k, 32),), np.int64)
            dists = np.empty((max(k, 32),), np.float64)
            s = (
                qa,
                rows,
                dists,
                qa.ctypes.data_as(ctypes.c_void_p),
                rows.ctypes.data_as(ctypes.c_void_p),
                dists.ctypes.data_as(ctypes.c_void_p),
            )
            tls.s = s
        return s

    @staticmethod
    def _fill_query(qa, q):
        try:
            qa[:] = q
        except ValueError:  # e.g. a [1, 3]-shaped query
            import numpy as np

            qa[:] = np.asarray(q, np.float64).reshape(3)

    def knn(self, q, k: int):
        qa, rows, dists, qp, rp, dp = self._scratch(k)
        self._fill_query(qa, q)
        cnt = self._lib.pcidx_knn(self._h, qp, k, rp, dp)
        return rows[:cnt].copy(), dists[:cnt].copy()

    def knn_batch(self, qs, k: int):
        """(rows i64[nq, k], dists f64[nq, k], counts i64[nq]) — one C
        call for the whole batch (the per-query Python loop costs ~40 us
        of interpreter overhead per call). Rows beyond counts[i] are
        garbage; callers mask."""
        import numpy as np

        qa = np.ascontiguousarray(np.asarray(qs, np.float64).reshape(-1, 3))
        nq = qa.shape[0]
        rows = np.empty((nq, k), np.int64)
        dists = np.empty((nq, k), np.float64)
        counts = np.empty((nq,), np.int64)
        self._lib.pcidx_knn_batch(
            self._h,
            qa.ctypes.data_as(ctypes.c_void_p),
            nq,
            k,
            rows.ctypes.data_as(ctypes.c_void_p),
            dists.ctypes.data_as(ctypes.c_void_p),
            counts.ctypes.data_as(ctypes.c_void_p),
        )
        return rows, dists, counts

    def radius(self, q, radius: float):
        import numpy as np

        qa, _, _, qp, _, _ = self._scratch(1)
        self._fill_query(qa, q)
        tls = self._tls
        hits = getattr(tls, "hits", None)
        if hits is None:
            hits = (np.empty((256,), np.int64),)
            hits = (hits[0], hits[0].ctypes.data_as(ctypes.c_void_p))
            tls.hits = hits
        while True:
            buf, bp = hits
            cnt = self._lib.pcidx_radius(
                self._h, qp, float(radius), bp, buf.shape[0]
            )
            if cnt <= buf.shape[0]:
                return buf[:cnt].copy()
            grown = np.empty((int(cnt),), np.int64)
            hits = (grown, grown.ctypes.data_as(ctypes.c_void_p))
            tls.hits = hits


def cluster_epilogue(labels, min_size: int, max_size: int):
    """Group rows by component label into the reference's canonical
    cluster order (size desc, first-member tiebreak; members ascending).
    Returns (order i32[n], starts i64[k+1]) — cluster c is
    order[starts[c]:starts[c+1]] — or None when the native library is
    unavailable (callers keep the numpy epilogue).

    C-side counting sort (pcindex.cpp:pcidx_cluster_epilogue): the
    Python np.argsort + per-segment slicing it replaces was ~37 ms at
    131K rows with many clusters."""
    import numpy as np

    lib = _load_index()
    if lib is None:
        return None
    lab = np.ascontiguousarray(np.asarray(labels, np.int32))
    n = lab.shape[0]
    order = np.empty((n,), np.int32)
    starts = np.empty((n + 1,), np.int64)
    k = lib.pcidx_cluster_epilogue(
        lab.ctypes.data_as(ctypes.c_void_p),
        n,
        int(min_size),
        int(max_size),
        order.ctypes.data_as(ctypes.c_void_p),
        starts.ctypes.data_as(ctypes.c_void_p),
    )
    return order, starts[: k + 1]


_pcquery_mod = ...  # memo: Ellipsis = not probed, None = unavailable


def _load_pcquery():
    """The CPython-extension fast path (_pcquery.so): ~0.3 us of per-query
    call overhead vs ~4 us through ctypes. Built by the same Makefile;
    memoized like the ctypes libraries."""
    global _pcquery_mod
    if _pcquery_mod is not ...:
        return _pcquery_mod
    mod = None
    try:
        so = os.path.join(_DIR, "_pcquery.so")
        if not os.path.exists(so):
            subprocess.run(
                ["make", "-C", _DIR, "_pcquery.so"],
                check=True,
                capture_output=True,
                timeout=120,
            )
        import importlib.util

        spec = importlib.util.spec_from_file_location("_pcquery", so)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    except Exception:
        mod = None
    _pcquery_mod = mod
    return mod


class ExtCellIndex:
    """CPython-extension handle for the C++ host index (pcquery.cpp wraps
    pcindex.cpp, so build/query/tie-order semantics are identical to
    NativeCellIndex — only the per-call overhead differs)."""

    def __init__(self, mod, caps):
        self._mod = mod
        self._caps = caps

    def nvalid(self) -> int:
        return int(self._mod.nvalid(self._caps))

    def knn(self, q, k: int):
        return self._mod.knn(self._caps, q, k)

    def knn_batch(self, qs, k: int):
        import numpy as np

        qa = np.ascontiguousarray(np.asarray(qs, np.float64).reshape(-1, 3))
        return self._mod.knn_batch(self._caps, qa, int(k))

    def radius(self, q, radius: float):
        return self._mod.radius(self._caps, q, float(radius))


def create_index(xyz, valid):
    """Build a native host index over (xyz f32[N,3], valid bool[N]), or
    None if the native library is unavailable. Prefers the CPython
    extension; falls back to the ctypes wrapper."""
    import numpy as np

    xyz = np.ascontiguousarray(np.asarray(xyz, np.float32))
    v = np.ascontiguousarray(np.asarray(valid, np.uint8))

    mod = _load_pcquery()
    if mod is not None:
        return ExtCellIndex(mod, mod.build(xyz, v))

    lib = _load_index()
    if lib is None:
        return None
    h = lib.pcidx_build(
        xyz.ctypes.data_as(ctypes.c_void_p),
        v.ctypes.data_as(ctypes.c_void_p),
        xyz.shape[0],
    )
    return NativeCellIndex(lib, h)
