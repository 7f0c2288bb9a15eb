"""Threaded window-generation pipeline: byte-identity with serial."""

import numpy as np

from jaeger_tpu.seqops.windows import window_batches


def _fasta(tmp_path, rng):
    p = tmp_path / "w.fasta"
    with open(p, "w") as fh:
        for i, n in enumerate([5000, 300, 2100, 950, 80, 4096, 1200,
                               640, 3333]):
            seq = "".join(rng.choice(list("ATGCN"),
                                     p=[0.24, 0.24, 0.24, 0.24, 0.04],
                                     size=n))
            fh.write(f">w{i} desc,comma\n{seq}\n")
        # a low-complexity contig exercises the dust path on workers
        fh.write(f">dusty\n{'ATATAT' * 300}\n")
    return str(p)


def test_workers_identical_to_serial(tmp_path, rng):
    fasta = _fasta(tmp_path, rng)
    kwargs = dict(fragsize=800, stride=500, min_len=300,
                  batch_capacity=7, dynamic_stride=True)
    serial = list(window_batches(fasta, **kwargs))
    threaded = list(window_batches(fasta, workers=4, **kwargs))
    assert len(serial) == len(threaded)
    for a, b in zip(serial, threaded):
        np.testing.assert_array_equal(a.bases, b.bases)
        assert a.headers == b.headers
        for f in ("length", "contig", "start", "contig_end", "ordinal",
                  "seqlen", "g", "c", "a", "t", "gc_skew"):
            np.testing.assert_array_equal(getattr(a, f), getattr(b, f), f)


def test_workers_with_contig_filter(tmp_path, rng):
    fasta = _fasta(tmp_path, rng)
    keep = lambda h: h.startswith("w") and int(h[1]) % 2 == 0  # noqa: E731
    flt = lambda h: keep(h.split()[0]) if h[0] == "w" else False  # noqa: E731
    kwargs = dict(fragsize=800, stride=800, min_len=300,
                  contig_filter=flt)
    serial = list(window_batches(fasta, **kwargs))
    threaded = list(window_batches(fasta, workers=3, **kwargs))
    sh = [h for b in serial for h in b.headers]
    th = [h for b in threaded for h in b.headers]
    assert sh == th and sh  # filtered, identical
