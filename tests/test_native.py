"""Native library vs pure-Python oracle parity."""

import numpy as np
import pytest

from jaeger_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable"
)


def test_fasta_reader_matches_python(tmp_path):
    from jaeger_tpu.seqops.fasta import read_fasta

    path = tmp_path / "t.fasta"
    path.write_text(
        ">seq one desc\nATGC\nGGTT\n\n>seq_two\nACGTACGT\n>empty\n>last\nTT\n"
    )
    py = list(read_fasta(path))
    nat = list(native.read_fasta_native(str(path)))
    assert nat == py


def test_fasta_reader_gzip(tmp_path):
    import gzip

    from jaeger_tpu.seqops.fasta import read_fasta

    path = tmp_path / "t.fasta.gz"
    with gzip.open(path, "wt") as fh:
        fh.write(">a\nATGCATGC\n>b\nGGGG\n")
    assert list(native.read_fasta_native(str(path))) == list(read_fasta(path))


def test_truncated_gzip_raises(tmp_path):
    """A truncated/corrupt .gz must raise, not end the stream early: the
    gzip layer reports the zlib error identically to EOF, so without the
    jt_fasta_error channel a partial assembly would produce a
    complete-looking TSV (the Python path raises BadGzipFile)."""
    import gzip

    path = tmp_path / "t.fasta.gz"
    with gzip.open(path, "wt") as fh:
        fh.write(">a\n" + "ACGT" * 400 + "\n>b\n" + "GGCC" * 400 + "\n")
    raw = path.read_bytes()
    trunc = tmp_path / "trunc.fasta.gz"
    trunc.write_bytes(raw[: len(raw) // 2])

    with pytest.raises(OSError, match="decompression|read"):
        list(native.read_fasta_native(str(trunc)))

    with pytest.raises(OSError, match="decompression|read"):
        for _ in native.window_pipeline_native(
                str(trunc), 500, None, False, 0.1, 100, None, False,
                64, 2):
            pass


def test_pipeline_missing_file_raises(tmp_path):
    with pytest.raises(OSError, match="cannot open"):
        for _ in native.window_pipeline_native(
                str(tmp_path / "nope.fa"), 500, None, False, 0.1, 100,
                None, False, 64, 2):
            pass


def test_reference_test_fasta():
    py_sum = 0
    nat_sum = 0
    from jaeger_tpu.seqops.fasta import read_fasta

    path = "/root/repo/jaeger_tpu/data/test/test_contigs.fasta"
    py = list(read_fasta(path))
    nat = list(native.read_fasta_native(path))
    assert len(py) == len(nat) == 9
    for (h1, s1), (h2, s2) in zip(py, nat):
        assert h1 == h2 and s1 == s2


def test_encode_matches(random_dna):
    from jaeger_tpu.seqops.windows import encode_ascii

    s = random_dna(500) + "NnXatgc"
    np.testing.assert_array_equal(
        native.encode_ascii_native(s), encode_ascii(s)
    )


def test_dust_matches_python(random_dna):
    from jaeger_tpu.seqops.dust import dust_intervals, dust_mask

    seqs = [
        random_dna(300) + "A" * 60 + random_dna(300),
        "ATATATATATATATATAT" * 10 + random_dna(200),
        random_dna(150) + "N" * 10 + "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA"
        + random_dna(150),
        random_dna(400),
    ]
    for s in seqs:
        assert native.dust_intervals_native(s) == dust_intervals(s)
        assert native.dust_mask_native(s) == dust_mask(s)


def test_dust_many_intervals_no_truncation(random_dna):
    """Regression: >2048 dust intervals must not be silently truncated.

    The native jt_dust_mask used a fixed 2048-interval buffer; long
    low-complexity contigs were left partially unmasked vs the Python
    fallback. Parity is pinned on a sequence with ~2200 intervals.
    """
    rng = np.random.default_rng(7)
    parts = []
    for _ in range(2200):
        parts.append("A" * 40)
        parts.append(
            "".join(rng.choice(list("ACGT"), size=24))
            + "N"  # N splits runs so each poly-A is its own interval
        )
    s = "".join(parts)
    iv = native.dust_intervals_native(s)
    assert len(iv) > 2048
    masked = native.dust_mask_native(s)
    # every interval must actually be lowercased, including those past
    # the old 2048 cap
    for start, end in iv:
        assert masked[start:end].islower()


def test_dust_gated_scan_fuzz_vs_oracle():
    """The C++ SDUST gates its perfect-interval scan on the whole-window
    score (rw*10 > T*L); the Python oracle runs ungated. Pin identical
    intervals across composition regimes where the gate's firing rate
    differs wildly (random / pure repeat / planted repeats / GC-skewed /
    N-interrupted)."""
    import random

    from jaeger_tpu.seqops.dust import dust_intervals

    rng = random.Random(42)
    seqs = []
    for trial in range(24):
        n = rng.randrange(100, 1800)
        mode = trial % 5
        if mode == 0:
            s = "".join(rng.choice("ACGT") for _ in range(n))
        elif mode == 1:
            unit = "".join(rng.choice("ACGT")
                           for _ in range(rng.randrange(1, 7)))
            s = (unit * (n // len(unit) + 1))[:n]
        elif mode == 2:
            chars = list("".join(rng.choice("ACGT") for _ in range(n)))
            for _ in range(rng.randrange(1, 5)):
                at = rng.randrange(0, n)
                w = rng.randrange(5, 90)
                unit = rng.choice(["A", "AT", "CAG", "TTAGGG", "N"])
                rep = (unit * (w // len(unit) + 1))[:w]
                chars[at:at + w] = list(rep)
            s = "".join(chars[:n])
        elif mode == 3:
            s = "".join(rng.choices("ACGT", weights=[8, 1, 1, 8], k=n))
        else:
            s = "".join(rng.choices("ACGT", weights=[5, 3, 1, 1], k=n))
        seqs.append(s)
    for s in seqs:
        assert native.dust_intervals_native(s) == dust_intervals(s)


def test_sw_matches_python(random_dna):
    from jaeger_tpu.postprocess.sw import smith_waterman

    core = random_dna(400)
    rep = random_dna(50)
    q = rep + core[:200]
    r = core[200:] + rep
    py = smith_waterman(q, r)
    nat = native.smith_waterman_native(q, r)
    assert nat.score == py.score
    assert nat.end_query == py.end_query
    assert nat.end_ref == py.end_ref
    assert nat.query_aligned == py.query_aligned
    assert nat.ref_aligned == py.ref_aligned
    assert nat.comp == py.comp


def test_sw_no_match():
    nat = native.smith_waterman_native("AAAA", "GGGG")
    assert nat.score <= 2


def test_composition_speed_sanity(random_dna):
    # native dust should handle a 100kb contig fast
    import time

    s = random_dna(100_000)
    t0 = time.time()
    native.dust_intervals_native(s)
    assert time.time() - t0 < 2.0


def test_cache_fallback_when_package_dir_unwritable(monkeypatch, tmp_path):
    """Read-only installs build the native lib into the user cache."""
    import importlib

    import jaeger_tpu.native as n

    n = importlib.reload(n)
    real_build = n._build
    calls = []

    def fake_build(target):
        calls.append(target)
        if target == n._SO:          # package dir "unwritable"
            return False
        return real_build(target)

    monkeypatch.setattr(n, "_build", fake_build)
    monkeypatch.setattr(n, "_SO", tmp_path / "never_exists.so")
    monkeypatch.setenv("XDG_CACHE_HOME", str(tmp_path / "cache"))
    # force a fresh load
    monkeypatch.setattr(n, "_LIB", None)
    monkeypatch.setattr(n, "_TRIED", False)
    lib = n._load()
    assert lib is not None
    cached = list((tmp_path / "cache" / "jaeger_tpu").glob("*.so"))
    assert len(cached) == 1
    importlib.reload(n)  # restore pristine module state for other tests


def test_contig_rows_native_matches_python(monkeypatch):
    """The one-call per-contig window loop (jt_contig_rows) is
    byte-identical to the pure-Python _contig_rows fallback across
    composition regimes: random DNA, tandem repeats (DUST fires), Ns,
    soft-masked lowercase, and the dynamic-stride path."""
    from jaeger_tpu.seqops import windows as W

    rng = np.random.default_rng(7)
    alphabet = list("ATGCatgcN")
    probs = [.22, .22, .22, .22, .02, .02, .02, .02, .04]
    for trial in range(40):
        n = int(rng.integers(400, 6000))
        seq = "".join(rng.choice(alphabet, p=probs, size=n))
        if trial % 3 == 0:
            seq = seq[:50] + "ATATATATAT" * 15 + seq[50:]
        if trial % 5 == 0:
            seq = seq[:20] + "N" * 30 + seq[20:]
        dyn = trial % 4 == 0
        args = ("ctg,x", seq, 500, 300, dyn, 10.0, 200, True)
        monkeypatch.setenv("JAEGER_TPU_NATIVE", "1")
        h1, w1, m1 = W._contig_rows(*args)
        monkeypatch.setenv("JAEGER_TPU_NATIVE", "0")
        h2, w2, m2 = W._contig_rows(*args)
        assert h1 == h2
        if w2 is None:
            assert w1 is None
            continue
        assert np.array_equal(w1, w2), trial
        # float64-exact: incl. the gc_skew Python-round parity column
        assert np.array_equal(m1, m2), trial


def test_native_gc_skew_python_round_parity():
    """jt_contig_rows' 2-decimal skew rounding (printf shortest-correct
    conversion) equals CPython round((g-c)/(g+c), 2) exactly, including
    the half-way-straddling values where np.round's scale-by-100
    disagrees."""
    from jaeger_tpu.seqops import windows as W

    rng = np.random.default_rng(3)
    gs = np.concatenate([rng.integers(0, 2000, 3000),
                         np.array([0, 1, 2, 125, 875])])
    cs = np.concatenate([rng.integers(0, 2000, 3000),
                         np.array([0, 2, 1, 875, 125])])
    for g, c in zip(gs.tolist(), cs.tolist()):
        seq = "G" * g + "C" * c + "AT" * 10
        starts = np.zeros(1, dtype=np.int64)
        wins, meta = native.contig_rows_native(
            seq, starts, len(seq), len(seq), dustmask=False)
        assert meta[0, 10] == W._gc_skew(g, c), (g, c)


def _synth_fasta(path, rng, n_contigs=60, gz=False):
    """Mixed-regime FASTA: random DNA, tandem repeats (DUST fires),
    N runs, soft-masked stretches, sub-min contigs, and a couple of
    long contigs that trip dynamic stride."""
    import gzip

    alphabet = list("ATGCatgcN")
    probs = [.22, .22, .22, .22, .02, .02, .02, .02, .04]
    opener = gzip.open if gz else open
    with opener(path, "wt") as fh:
        for i in range(n_contigs):
            if i % 13 == 5:
                n = int(rng.integers(40, 400))      # below min_len
            elif i % 17 == 3:
                n = int(rng.integers(30_000, 60_000))  # dynamic-stride range
            else:
                n = int(rng.integers(600, 9_000))
            seq = "".join(rng.choice(alphabet, p=probs, size=n))
            if i % 3 == 0:
                seq = seq[:64] + "ACACACACAC" * 20 + seq[64:]
            if i % 4 == 1:
                seq = seq[:100] + "N" * int(rng.integers(10, 120)) + seq[100:]
            fh.write(f">contig_{i} desc {i}\n")
            for j in range(0, len(seq), 80):
                fh.write(seq[j : j + 80] + "\n")


@pytest.mark.parametrize(
    "dyn,workers,max_len,batch_cap,gz",
    [
        (False, 1, None, 512, False),
        (False, 2, None, 512, False),
        (False, 4, None, 257, False),   # odd capacity: batch-boundary splits
        (True, 2, None, 512, False),
        (True, 4, 20_000, 512, False),
        (False, 2, 8_000, 512, True),   # gzip input
    ],
)
def test_pipeline_matches_python(tmp_path, monkeypatch, dyn, workers,
                                 max_len, batch_cap, gz):
    """The all-native window pipeline (jt_pipeline_*: reader thread +
    worker pool + ordered batcher, the DEFAULT ingest path) streams
    batches byte-identical to the pure-Python pipeline — every array
    field, batch boundary, and header, across fixed/dynamic stride,
    worker counts, max_len and gzip."""
    from jaeger_tpu.seqops.windows import window_batches

    rng = np.random.default_rng(11)
    fa = tmp_path / ("p.fasta.gz" if gz else "p.fasta")
    _synth_fasta(fa, rng, gz=gz)

    def collect(native_on):
        monkeypatch.setenv("JAEGER_TPU_NATIVE", "1" if native_on else "0")
        out = []
        for b in window_batches(str(fa), fragsize=2000, stride=2000,
                                dynamic_stride=dyn, min_len=500,
                                max_len=max_len, batch_capacity=batch_cap,
                                workers=workers):
            out.append(b)
        return out

    nat, py = collect(True), collect(False)
    assert len(nat) == len(py)
    fields = ["bases", "length", "contig", "start", "contig_end",
              "ordinal", "seqlen", "g", "c", "a", "t", "gc_skew"]
    for k, (b1, b2) in enumerate(zip(nat, py)):
        for f in fields:
            v1, v2 = getattr(b1, f), getattr(b2, f)
            assert np.array_equal(v1, v2), (k, f)
        assert b1.headers == b2.headers, k
