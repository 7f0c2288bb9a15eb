"""Live parity of FASTA windowing with the reference's
``seqops/io.fragment_generator``: window grid (fixed + dynamic stride),
whole-contig short windows, contig-end flags, ordinals, and per-window
composition metadata (g/c/a/t counts, gc_skew rounding).

pyfastx is stubbed with an in-memory FASTA reader and pydustmasker with
our own SDUST (byte-exact vs the real library's algorithm, pinned by
tests/test_native.py), so the comparison isolates the windowing logic.
"""

from __future__ import annotations

import sys
import types

import numpy as np
import pytest

from jaeger_tpu.seqops.dust import dust_mask
from jaeger_tpu.seqops.fasta import read_fasta
from jaeger_tpu.seqops.windows import window_batches

_RECORDS: dict[str, list[tuple[str, str]]] = {}


def _install_stubs():
    # other live-parity tests may have installed bare stub modules first
    # (and the reference modules hold references to those objects), so
    # mutate the existing stubs rather than replacing them
    fake_fx = sys.modules.setdefault("pyfastx", types.ModuleType("pyfastx"))

    class Fasta:
        def __init__(self, path, build_index=False):
            self._records = (
                _RECORDS.get(path) or list(read_fasta(path))
            )

        def __iter__(self):
            return iter(self._records)

    fake_fx.Fasta = Fasta
    fake_dust = sys.modules.setdefault(
        "pydustmasker", types.ModuleType("pydustmasker"))

    class DustMasker:
        def __init__(self, seq, window_size=64, score_threshold=20):
            self._seq = seq
            self._w, self._t = window_size, score_threshold

        def mask(self):
            return dust_mask(self._seq, self._w, self._t)

    fake_dust.DustMasker = DustMasker


sys.path.insert(0, "/root/reference/src")
_install_stubs()
ref_io = pytest.importorskip("jaeger.seqops.io")

#: our base-ID alphabet -> characters (upper 0-4, soft-masked 5-8)
_ID2CHR = np.frombuffer(b"ATGCNatgc", dtype=np.uint8)


def _decode(bases: np.ndarray, length: int) -> str:
    return _ID2CHR[bases[:length]].tobytes().decode()


def _our_rows(path, **kw):
    rows = []
    for wb in window_batches(path, **kw):
        for i in range(len(wb)):
            rows.append((
                _decode(wb.bases[i], int(wb.length[i])),
                wb.headers[int(wb.contig[i])],
                int(wb.start[i]), int(wb.contig_end[i]),
                int(wb.ordinal[i]), int(wb.seqlen[i]),
                int(wb.g[i]), int(wb.c[i]), int(wb.a[i]), int(wb.t[i]),
                float(wb.gc_skew[i]),
            ))
    return rows


def _ref_rows(path, **kw):
    rows = []
    for line in ref_io.fragment_generator(str(path), **kw):
        parts = line.split(",")
        (seq, header, index, end, i, seqlen, g, c, a, t, skew) = parts
        rows.append((seq, header, int(index), int(end), int(i),
                     int(seqlen), int(g), int(c), int(a), int(t),
                     float(skew)))
    return rows


def _write_fasta(tmp_path, rng, specs):
    """specs: list of (length, dusty) — dusty contigs get a low-complexity
    insert so the DUST mask is actually exercised."""
    lines = []
    for idx, (n, dusty) in enumerate(specs):
        seq = "".join(rng.choice(list("ATGC"), size=n))
        if dusty:
            mid = n // 2
            seq = seq[:mid] + "AT" * 40 + seq[mid + 80:]
        lines.append(f">contig_{idx} desc\n{seq}")
    p = tmp_path / "in.fasta"
    p.write_text("\n".join(lines) + "\n")
    return p


@pytest.mark.parametrize("dynamic", [False, True])
def test_fragment_rows_match_live_reference(tmp_path, rng, dynamic):
    path = _write_fasta(
        tmp_path, rng,
        [(5200, True), (2400, False), (1100, False), (700, True), (400, False)],
    )
    kw_ref = dict(fragsize=1000, stride=1000, min_len=500,
                  dynamic_stride=dynamic, dynamic_stride_threshold=4.0)
    ref = _ref_rows(path, **kw_ref)
    ours = _our_rows(path, fragsize=1000, stride=1000, min_len=500,
                     dynamic_stride=dynamic, dynamic_stride_threshold=4.0)
    assert len(ours) == len(ref)
    for r, o in zip(ref, ours):
        assert o[:10] == r[:10], (r, o)
        # gc_skew: same round-to-2 value, ours stored float32
        assert o[10] == pytest.approx(r[10], abs=1e-6)


# ---------------------------------------------------------------------------
# Fuzzed parity: IUPAC ambiguity, soft-masking, N runs, short/edge contigs
# ---------------------------------------------------------------------------

#: reference rows carry the raw characters; our 9-ID alphabet folds every
#: non-ATGC (incl. IUPAC ambiguity codes, any case) onto N by design
def _canonical(seq: str) -> str:
    return "".join(c if c in "ATGCatgc" else "N" for c in seq)


def _fuzz_contig(rng, n: int) -> str:
    chars = list("ATGC")
    seq = rng.choice(chars, size=max(n, 1))
    # lowercase (soft-masked) stretch
    if n > 60:
        s = int(rng.integers(0, n - 50))
        seq[s:s + 50] = [c.lower() for c in seq[s:s + 50]]
    # N run
    if n > 120 and rng.random() < 0.8:
        s = int(rng.integers(0, n - 40))
        seq[s:s + 40] = "N"
    # scattered IUPAC ambiguity codes, both cases
    iupac = list("RYKMSWBDHVrykmswbdhv")
    for _ in range(int(rng.integers(0, 12))):
        seq[int(rng.integers(0, n))] = iupac[int(rng.integers(0, len(iupac)))]
    return "".join(seq)


@pytest.mark.parametrize("seed", [11, 23, 47])
@pytest.mark.parametrize("dynamic", [False, True])
def test_fuzzed_fragment_rows_match_live_reference(tmp_path, seed, dynamic):
    rng = np.random.default_rng(seed)
    specs = [int(rng.integers(50, 4500)) for _ in range(14)]
    specs += [499, 500, 501, 999, 1000, 1001, 2000]  # min_len/fragsize edges
    lines = []
    for idx, n in enumerate(specs):
        seq = _fuzz_contig(rng, n)
        # wrap at odd width; CRLF endings on half the records
        width = int(rng.integers(37, 91))
        wrapped = "\n".join(seq[i:i + width] for i in range(0, len(seq), width))
        rec = f">fz_{idx} len={n}\n{wrapped}"
        if idx % 2:
            rec = rec.replace("\n", "\r\n")
        lines.append(rec)
    path = tmp_path / "fuzz.fasta"
    path.write_text("\n".join(lines) + "\n")

    kw = dict(fragsize=1000, stride=500, min_len=500,
              dynamic_stride=dynamic, dynamic_stride_threshold=4.0)
    ref = _ref_rows(path, **kw)
    ours = _our_rows(path, **kw)
    assert len(ours) == len(ref) > 0
    for r, o in zip(ref, ours):
        assert o[0] == _canonical(r[0]), (r[1], r[2])
        assert o[1:10] == r[1:10], (r, o)
        assert o[10] == pytest.approx(r[10], abs=1e-6)
