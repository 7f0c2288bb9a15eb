"""Stubs that make the REFERENCE package runnable in this image for
end-to-end live-parity tests: pyfastx (in-memory FASTA reader),
pydustmasker (backed by our byte-exact SDUST), parasail (backed by our
reference-parity Smith-Waterman), and an import-only polars shim.

All stubs mutate existing stub modules when present (other live tests
may have installed bare placeholders first, and reference modules hold
references to those objects).
"""

from __future__ import annotations

import sys
import types


def install() -> None:
    from jaeger_tpu.postprocess.sw import smith_waterman
    from jaeger_tpu.seqops.dust import dust_mask
    from jaeger_tpu.seqops.fasta import read_fasta

    fx = sys.modules.setdefault("pyfastx", types.ModuleType("pyfastx"))

    class Fasta:
        def __init__(self, path, build_index=False):
            self._r = list(read_fasta(path))

        def __iter__(self):
            return iter(self._r)

        def __len__(self):
            return len(self._r)

    fx.Fasta = Fasta

    pdm = sys.modules.setdefault(
        "pydustmasker", types.ModuleType("pydustmasker"))

    class DustMasker:
        def __init__(self, seq, window_size=64, score_threshold=20):
            self._s, self._w, self._t = seq, window_size, score_threshold

        def mask(self):
            return dust_mask(self._s, self._w, self._t)

    pdm.DustMasker = DustMasker

    ps = sys.modules.setdefault("parasail", types.ModuleType("parasail"))

    class _Matrix:
        def __init__(self, alphabet, match, mismatch):
            self.match, self.mismatch = match, mismatch

    class _Traceback:
        def __init__(self, query, comp, ref):
            self.query, self.comp, self.ref = query, comp, ref

    class _Result:
        def __init__(self, r):
            self.score = r.score
            self.end_query = r.end_query
            self.end_ref = r.end_ref
            self.saturated = r.saturated
            self.traceback = _Traceback(r.query_aligned, r.comp,
                                        r.ref_aligned)

    def _sw(query, ref, open_, extend, matrix):
        return _Result(smith_waterman(str(query), str(ref), open_, extend,
                                      matrix.match, matrix.mismatch))

    ps.matrix_create = _Matrix
    ps.sw_trace_scan_16 = _sw

    # Import-only shim: the reference imports polars at module scope but
    # the stubbed call paths never construct frames.  The classes must be
    # dedicated sentinels (never ``object``): sklearn probes
    # ``isinstance(X, (pl.DataFrame, pl.Series))`` on every estimator
    # input once "polars" is importable, so ``DataFrame = object`` made
    # *every* array look like a polars frame, and a missing ``Series``
    # raised AttributeError deep inside sklearn.
    pl = sys.modules.setdefault("polars", types.ModuleType("polars"))
    for _cls in ("DataFrame", "Series", "LazyFrame"):
        if not isinstance(getattr(pl, _cls, None), type) or \
                getattr(pl, _cls, None) is object:
            setattr(pl, _cls, type(_cls, (), {}))

    # FUNCTIONAL stubs for the prophage deps (ruptures/kneed/
    # pyrodigal_gv).  The reference's prophages.py binds
    # ``from kneed import KneeLocator`` at MODULE scope and
    # predict_legacy imports it transitively, so whichever test module
    # is collected first freezes the stub objects into the reference
    # module — import-only dummies here made the reference's segment()
    # silently return no prophages in whole-suite runs (test-order
    # dependent).  Installing the functional stubs up front makes the
    # bindings order-independent.
    install_prophage()
    pc = sys.modules.setdefault("pycirclize", types.ModuleType("pycirclize"))
    if not isinstance(getattr(pc, "Circos", None), type):
        pc.Circos = type("Circos", (), {})

    if "/root/reference/src" not in sys.path:
        sys.path.insert(0, "/root/reference/src")


def install_prophage() -> None:
    """Upgrade the ruptures/kneed import-only shims to FUNCTIONAL stubs
    backed by our CPD implementations, and stub pyrodigal_gv with our
    gene caller — so the reference's prophage pipeline (segment /
    refine_prophage_boundaries / prophage_report) runs live with the
    engine components shared.  What live-parity tests then pin is all
    of the reference's first-party logic around those engines: the
    penalty sweep + knee selection + sensitivity filter + range merge,
    boundary snapping arithmetic, and the att-repeat report."""
    import sys
    import types

    from jaeger_tpu.postprocess import genes as _genes
    from jaeger_tpu.postprocess.cpd import (
        KneeLocator as _KneeLocator,
        kernel_cpd_linear,
    )

    rpt = sys.modules.setdefault("ruptures", types.ModuleType("ruptures"))

    class KernelCPD:
        def __init__(self, kernel="linear", min_size=2, jump=5):
            if kernel != "linear":
                raise NotImplementedError(kernel)
            self._min_size = min_size
            self._signal = None

        def fit(self, signal):
            self._signal = signal
            return self

        def predict(self, pen):
            return kernel_cpd_linear(
                self._signal, pen=pen, min_size=self._min_size
            )

    rpt.KernelCPD = KernelCPD

    kn = sys.modules.setdefault("kneed", types.ModuleType("kneed"))
    kn.KneeLocator = _KneeLocator

    pg = sys.modules.setdefault(
        "pyrodigal_gv", types.ModuleType("pyrodigal_gv"))

    class _Gene:
        def __init__(self, start, end):
            self.begin, self.end = start + 1, end  # 1-based closed

    class ViralGeneFinder:
        def __init__(self, meta=True):
            pass

        def find_genes(self, sequence):
            return [_Gene(s, e) for s, e in _genes.find_genes(sequence)]

    pg.ViralGeneFinder = ViralGeneFinder
