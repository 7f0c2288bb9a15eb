"""ctypes bindings for the native host library.

Builds ``libjaeger_host.so`` from :file:`jaeger_host.cpp` on first use
(g++ -O3, cached next to the source) and exposes the native FASTA reader,
SDUST masker, encoder, and Smith-Waterman. Every entry point has a pure
Python fallback elsewhere in the package; call :func:`available` to check
whether the fast path is live.
"""

from __future__ import annotations

import ctypes
import logging
import subprocess
from pathlib import Path

logger = logging.getLogger("jaeger_tpu")

_SRC = Path(__file__).parent / "jaeger_host.cpp"
_SO = Path(__file__).parent / "libjaeger_host.so"
_LIB: ctypes.CDLL | None = None
_TRIED = False


def _cache_so() -> Path:
    """Per-user fallback build location for read-only installs
    (site-packages from a wheel is often not writable)."""
    import hashlib
    import os

    root = Path(os.environ.get("XDG_CACHE_HOME",
                               Path.home() / ".cache")) / "jaeger_tpu"
    tag = hashlib.sha1(_SRC.read_bytes()).hexdigest()[:12]
    return root / f"libjaeger_host-{tag}.so"


def _build(target: Path) -> bool:
    try:
        target.parent.mkdir(parents=True, exist_ok=True)
        cmd = [
            "g++", "-O3", "-march=native", "-fPIC", "-shared", "-std=c++17",
            str(_SRC), "-o", str(target), "-lz",
        ]
        result = subprocess.run(cmd, capture_output=True, text=True,
                                timeout=120)
        if result.returncode != 0:
            logger.debug(f"native build failed: {result.stderr[:500]}")
            return False
        return True
    except (OSError, subprocess.SubprocessError) as e:
        logger.debug(f"native build unavailable: {e}")
        return False


def _load() -> ctypes.CDLL | None:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    so = _SO
    if not so.exists() or so.stat().st_mtime < _SRC.stat().st_mtime:
        if not _build(so):
            # read-only install: retry in the user cache (content-hashed,
            # so a new source version rebuilds automatically)
            so = _cache_so()
            if not so.exists() and not _build(so):
                return None
    try:
        lib = ctypes.CDLL(str(so))
    except OSError as e:
        logger.debug(f"native load failed: {e}")
        return None

    lib.jt_open_fasta.restype = ctypes.c_void_p
    lib.jt_open_fasta.argtypes = [ctypes.c_char_p]
    lib.jt_next_contig.restype = ctypes.c_long
    lib.jt_next_contig.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.POINTER(ctypes.c_char_p),
    ]
    lib.jt_close_fasta.argtypes = [ctypes.c_void_p]
    lib.jt_fasta_error.restype = ctypes.c_char_p
    lib.jt_fasta_error.argtypes = [ctypes.c_void_p]
    lib.jt_encode_ascii.argtypes = [
        ctypes.c_char_p, ctypes.c_long, ctypes.c_char_p,
    ]
    lib.jt_composition.argtypes = [
        ctypes.c_char_p, ctypes.c_long, ctypes.POINTER(ctypes.c_long),
    ]
    lib.jt_sdust.restype = ctypes.c_long
    lib.jt_sdust.argtypes = [
        ctypes.c_char_p, ctypes.c_long, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_long), ctypes.c_long,
    ]
    lib.jt_dust_mask.restype = ctypes.c_long
    lib.jt_dust_mask.argtypes = [
        ctypes.c_char_p, ctypes.c_long, ctypes.c_int, ctypes.c_int,
    ]
    lib.jt_contig_ids.restype = ctypes.c_long
    lib.jt_contig_ids.argtypes = [
        ctypes.c_char_p, ctypes.c_long, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_char_p,
    ]
    lib.jt_window_counts.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_long), ctypes.c_long,
        ctypes.c_long, ctypes.POINTER(ctypes.c_long),
    ]
    lib.jt_contig_rows.restype = ctypes.c_long
    lib.jt_contig_rows.argtypes = [
        ctypes.c_char_p, ctypes.c_long, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_long), ctypes.c_long,
        ctypes.c_long, ctypes.c_long, ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_double),
    ]
    lib.jt_pipeline_open.restype = ctypes.c_void_p
    lib.jt_pipeline_open.argtypes = [
        ctypes.c_char_p, ctypes.c_long, ctypes.c_long, ctypes.c_int,
        ctypes.c_double, ctypes.c_long, ctypes.c_long, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_long, ctypes.c_int,
    ]
    lib.jt_pipeline_next.restype = ctypes.c_long
    lib.jt_pipeline_next.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_double),
    ]
    lib.jt_pipeline_header_bytes.restype = ctypes.c_long
    lib.jt_pipeline_header_bytes.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_long),
    ]
    lib.jt_pipeline_drain_headers.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.POINTER(ctypes.c_long),
    ]
    lib.jt_pipeline_error.restype = ctypes.c_char_p
    lib.jt_pipeline_error.argtypes = [ctypes.c_void_p]
    lib.jt_pipeline_close.argtypes = [ctypes.c_void_p]
    lib.jt_smith_waterman.restype = ctypes.c_long
    lib.jt_smith_waterman.argtypes = [
        ctypes.c_char_p, ctypes.c_long, ctypes.c_char_p, ctypes.c_long,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_long), ctypes.POINTER(ctypes.c_long),
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_long,
    ]
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def read_fasta_native(path: str):
    """Yield (header, sequence) like seqops.fasta.read_fasta."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    handle = lib.jt_open_fasta(str(path).encode())
    if not handle:
        raise OSError(f"cannot open {path}")
    try:
        header = ctypes.c_char_p()
        seq = ctypes.c_char_p()
        while True:
            n = lib.jt_next_contig(handle, ctypes.byref(header),
                                   ctypes.byref(seq))
            if n < 0:
                # -1 is both clean EOF and read error (truncated/corrupt
                # gzip) — distinguish, or a partial read looks complete
                err = lib.jt_fasta_error(handle)
                if err:
                    msg = err.decode()
                    if str(path) not in msg:
                        msg = f"{msg} in {path}"
                    raise OSError(msg)
                break
            yield header.value.decode("ascii"), seq.value.decode("ascii")
    finally:
        lib.jt_close_fasta(handle)


def encode_ascii_native(seq: str):
    import numpy as np

    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    raw = seq.encode("ascii")
    out = np.empty(len(raw), dtype=np.uint8)
    lib.jt_encode_ascii(raw, len(raw),
                        out.ctypes.data_as(ctypes.c_char_p))
    return out


def dust_intervals_native(seq: str, window: int = 64,
                          threshold: int = 20) -> list[tuple[int, int]]:
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    raw = seq.encode("ascii")
    cap = max(1024, len(seq) // 16)
    while True:
        buf = (ctypes.c_long * (cap * 2))()
        # returns the TOTAL interval count; > cap means the buffer was
        # too small and only cap pairs were written — retry larger
        n = lib.jt_sdust(raw, len(raw), window, threshold, buf, cap)
        if n <= cap:
            return [(buf[2 * i], buf[2 * i + 1]) for i in range(n)]
        cap = n


def dust_mask_native(seq: str, window: int = 64, threshold: int = 20) -> str:
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    buf = ctypes.create_string_buffer(seq.encode("ascii"), len(seq))
    lib.jt_dust_mask(buf, len(seq), window, threshold)
    return buf.raw[: len(seq)].decode("ascii")


def contig_ids_native(seq: str, dustmask: bool = True, window: int = 64,
                      threshold: int = 20):
    """Uppercase + SDUST + base-ID encode in one native call.

    Equivalent to ``encode_ascii(dust_mask(seq.upper()))`` but without the
    intermediate Python strings (hot path of ``seqops.windows``).
    """
    import numpy as np

    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    raw = seq.encode("ascii")
    out = np.empty(len(raw), dtype=np.uint8)
    lib.jt_contig_ids(raw, len(raw), 1 if dustmask else 0, window,
                      threshold, out.ctypes.data_as(ctypes.c_char_p))
    return out


def window_counts_native(ids, starts, width: int):
    """(n_windows, 4) A/T/G/C counts over uppercase base IDs per window."""
    import numpy as np

    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    ids = np.ascontiguousarray(ids, dtype=np.uint8)
    starts = np.ascontiguousarray(starts, dtype=np.int64)
    out = np.empty((starts.shape[0], 4), dtype=np.int64)
    lib.jt_window_counts(
        ids.ctypes.data_as(ctypes.c_char_p),
        starts.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        starts.shape[0], width,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
    )
    return out


def contig_rows_native(seq: str, starts, fragsize: int, seqlen_meta: int,
                       dustmask: bool = True, window: int = 64,
                       threshold: int = 20):
    """The whole per-contig window loop in ONE GIL-released native call.

    Returns ``(wins, meta)``: ``wins`` is ``(n_windows, fragsize)`` uint8
    base IDs, ``meta`` is the ``(n_windows, 11)`` float64 batcher block
    ``[length, hidx=0, start, contig_end, ordinal, seqlen, g, c, a, t,
    gc_skew]``. ctypes drops the GIL for the call's full duration, so the
    ``window_batches(workers=N)`` thread pool scales with cores instead
    of serializing on per-window Python (round-5 ingest scaling).
    Behaviour pinned against the pure-Python ``_contig_rows`` fallback by
    tests/test_native.py.
    """
    import numpy as np

    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    raw = seq.encode("ascii")
    starts = np.ascontiguousarray(starts, dtype=np.int64)
    n_win = starts.shape[0]
    wins = np.empty((n_win, fragsize), dtype=np.uint8)
    meta = np.empty((n_win, 11), dtype=np.float64)
    lib.jt_contig_rows(
        raw, len(raw), 1 if dustmask else 0, window, threshold,
        starts.ctypes.data_as(ctypes.POINTER(ctypes.c_long)), n_win,
        fragsize, seqlen_meta,
        wins.ctypes.data_as(ctypes.c_char_p),
        meta.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    return wins, meta


def window_pipeline_native(path: str, fragsize: int, stride: int | None,
                           dynamic_stride: bool, dyn_threshold: float,
                           min_len: int, max_len: int | None,
                           dustmask: bool, batch_capacity: int,
                           workers: int):
    """Stream ``(bases, meta, new_headers)`` batches from the all-native
    window pipeline (reader thread + worker pool + ordered batcher in
    jaeger_host.cpp). One GIL-released call per batch; ``meta`` is the
    11-column float64 block of ``window_batches`` with the GLOBAL contig
    index already in column 1. Byte-identical to the Python pipeline
    (tests/test_native.py::test_pipeline_matches_python).
    """
    import numpy as np

    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    handle = lib.jt_pipeline_open(
        str(path).encode(), fragsize, -1 if stride is None else stride,
        1 if dynamic_stride else 0, float(dyn_threshold), min_len,
        -1 if max_len is None else max_len, 1 if dustmask else 0,
        64, 20, batch_capacity, workers,
    )
    if not handle:
        raise OSError(f"cannot open {path}")
    try:
        while True:
            bases = np.empty((batch_capacity, fragsize), dtype=np.uint8)
            meta = np.empty((batch_capacity, 11), dtype=np.float64)
            n = lib.jt_pipeline_next(
                handle, bases.ctypes.data_as(ctypes.c_char_p),
                meta.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
            if n < 0:
                err = lib.jt_pipeline_error(handle)
                raise OSError(err.decode() if err
                              else f"cannot read {path}")
            count = ctypes.c_long()
            total = lib.jt_pipeline_header_bytes(handle,
                                                 ctypes.byref(count))
            new_headers: list[str] = []
            if count.value:
                buf = ctypes.create_string_buffer(max(1, total))
                lens = (ctypes.c_long * count.value)()
                lib.jt_pipeline_drain_headers(handle, buf, lens)
                off = 0
                for i in range(count.value):
                    new_headers.append(
                        buf.raw[off: off + lens[i]].decode("ascii"))
                    off += lens[i]
            if n == 0 and not new_headers:
                break
            yield bases[:n], meta[:n], new_headers
            if n == 0:
                break
    finally:
        lib.jt_pipeline_close(handle)


def smith_waterman_native(query: str, ref: str, open_: int = 100,
                          extend: int = 5, match: int = 2,
                          mismatch: int = -100):
    """Returns an SWResult compatible with postprocess.sw."""
    from jaeger_tpu.postprocess.sw import SWResult

    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    cap = len(query) + len(ref) + 2
    q_out = ctypes.create_string_buffer(cap)
    r_out = ctypes.create_string_buffer(cap)
    end_q = ctypes.c_long()
    end_r = ctypes.c_long()
    score = lib.jt_smith_waterman(
        query.encode("ascii"), len(query), ref.encode("ascii"), len(ref),
        open_, extend, match, mismatch,
        ctypes.byref(end_q), ctypes.byref(end_r), q_out, r_out, cap,
    )
    qa = q_out.value.decode("ascii")
    ra = r_out.value.decode("ascii")
    comp = "".join(
        "|" if (a == b and a != "-" and a.upper() in "ACGT")
        else (" " if (a == "-" or b == "-") else ".")
        for a, b in zip(qa, ra)
    )
    return SWResult(
        score=int(score), end_query=int(end_q.value),
        end_ref=int(end_r.value), query_aligned=qa, ref_aligned=ra,
        comp=comp,
    )
