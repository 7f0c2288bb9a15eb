"""Dataops tests: converter, loaders, transforms, synthetic, OOD, split."""

import numpy as np
import pytest

from jaeger_tpu.dataops.convert import (
    _class_interleaved_permutation,
    _crop_starts,
    convert_dataset,
    encode_nucleotide_batch,
    encode_translated_batch,
    translated_frame_length,
)
from jaeger_tpu.seqops import crop
from jaeger_tpu.seqops.transform import (
    dinuc_shuffle,
    kmer_shuffle,
    reverse_complement,
    shuffle_dna,
)
from jaeger_tpu.seqops.windows import encode_ascii
from jaeger_tpu.train.data import batches_from_npz, load_npz_dataset


def _csv(tmp_path, rows):
    p = tmp_path / "data.csv"
    p.write_text("".join(f"{label},{seq}\n" for label, seq in rows))
    return str(p)


class TestEncoders:
    def test_matches_device_encoder_at_contract_crop(self, random_dna):
        """Converter tokens == device-encoder tokens at nt = 3c + 5."""
        from jaeger_tpu.ops.encode import encode_frames

        crop_nt = crop.codons_to_nucleotides(33)  # 104
        seqs = [random_dna(crop_nt) for _ in range(5)]
        bases = np.stack([encode_ascii(s) for s in seqs])
        lengths = np.full(5, crop_nt, np.int32)
        conv = encode_translated_batch(bases, lengths, crop_nt)
        dev = np.asarray(encode_frames(bases, lengths, crop_size=crop_nt))
        np.testing.assert_array_equal(conv, dev)

    def test_frame_length_arithmetic(self):
        assert translated_frame_length(500) == 165
        assert translated_frame_length(1505) == 500
        assert translated_frame_length(500, dicodon=True) == 164
        assert translated_frame_length(3) == 0

    def test_short_sequence_masked_tail(self, random_dna):
        bases = np.full((1, 100), 4, np.uint8)
        ids = encode_ascii(random_dna(40))
        bases[0, :40] = ids
        out = encode_translated_batch(bases, np.array([40]), 100)
        k_valid = 40 // 3 - 1
        assert (out[0, :, :k_valid] > 0).all()
        assert (out[0, :, k_valid:] == 0).all()

    def test_dicodon(self, random_dna):
        s = random_dna(65)
        bases = encode_ascii(s)[None]
        out = encode_translated_batch(
            bases, np.array([65]), 65, codon_map="cod_id"
        )
        assert out.shape == (1, 6, translated_frame_length(65, True))
        assert out.max() <= 4096

    def test_nucleotide_int_map(self):
        bases = encode_ascii("AGTCN")[None]
        out = encode_nucleotide_batch(bases, np.array([5]), 5)
        # default map {A:1,G:2,T:3,C:4,N:0}
        np.testing.assert_array_equal(out[0, 0], [1, 2, 3, 4, 0])
        # channel 2 is the IN-PLACE complement (reference converter
        # semantics, convert.py:276-296 — no reversal): T C A G N
        np.testing.assert_array_equal(out[0, 1], [3, 4, 1, 2, 0])

    def test_nucleotide_onehot(self):
        bases = encode_ascii("AGCTN")[None]
        out = encode_nucleotide_batch(
            bases, np.array([5]), 5, one_hot=True
        )
        assert out.shape == (1, 2, 5, 4)
        assert out[0, 0, 4].sum() == 0  # N -> zero row


class TestConvert:
    def test_roundtrip(self, tmp_path, random_dna):
        rows = [(i % 3, random_dna(120)) for i in range(30)]
        csv = _csv(tmp_path, rows)
        out = tmp_path / "out.npz"
        summary = convert_dataset(csv, str(out), crop_size=104,
                                  compress="fast", pad=True)
        assert summary["rows"] == 30
        data = load_npz_dataset(out)
        assert data["translated"].shape == (30, 6, 33)
        assert set(np.unique(data["labels"])) == {0, 1, 2}
        np.testing.assert_array_equal(data["lengths"], np.full(30, 104))

    def test_multi_crop_sliding(self, tmp_path, random_dna):
        rows = [(0, random_dna(300))]
        csv = _csv(tmp_path, rows)
        out = tmp_path / "out.npz"
        summary = convert_dataset(csv, str(out), crop_size=[100],
                                  stride=100)
        # starts 0,100,200 for a 300bp seq at crop 100
        assert summary["rows"] == 3

    def test_crop_starts(self):
        assert _crop_starts(300, 100, 100) == [0, 100, 200]
        assert _crop_starts(350, 100, 100) == [0, 100, 200, 250]
        assert _crop_starts(90, 100, 100) == [0]
        assert _crop_starts(300, 100, 0) == [0]

    def test_ragged_output(self, tmp_path, random_dna):
        rows = [(0, random_dna(80)), (1, random_dna(120))]
        csv = _csv(tmp_path, rows)
        out = tmp_path / "ragged.npz"
        convert_dataset(csv, str(out), crop_size=104, pad=False)
        data = load_npz_dataset(out)
        assert data["translated"].dtype == object
        assert data["translated"][0].shape[-1] == 80 // 3 - 1

    def test_sharded_manifest(self, tmp_path, random_dna):
        rows = [(i % 2, random_dna(60)) for i in range(25)]
        csv = _csv(tmp_path, rows)
        out = tmp_path / "shards.npz"
        convert_dataset(csv, str(out), crop_size=59, shard_size=10,
                        balance_classes=True)
        data = load_npz_dataset(out)
        assert data["translated"].shape[0] == 25

    def test_balanced_interleave(self):
        labels = np.array([0] * 8 + [1] * 4)
        perm = _class_interleaved_permutation(labels, seed=0)
        # every prefix should be close to the global ratio
        seq = labels[perm]
        first_half = seq[:6]
        assert 1 <= (first_half == 1).sum() <= 3

    def test_batches_from_npz(self, tmp_path, random_dna):
        rows = [(i % 3, random_dna(104)) for i in range(40)]
        csv = _csv(tmp_path, rows)
        out = tmp_path / "b.npz"
        convert_dataset(csv, str(out), crop_size=104, pad=True)
        b = next(batches_from_npz(out, batch_size=16, num_classes=3))
        assert b["translated"].shape == (16, 6, 33)
        assert b["labels"].shape == (16, 3)


class TestTransforms:
    def test_reverse_complement(self):
        assert reverse_complement("ATGC") == "GCAT"
        assert reverse_complement("ATGCN") == "NGCAT"
        assert reverse_complement("RYKM") == "KMRY"

    def test_shuffle_preserves_mono(self):
        s = "AAATTTGGGCCCC"
        out = shuffle_dna(s, np.random.default_rng(0))
        assert sorted(out) == sorted(s)

    def test_kmer_shuffle(self):
        s = "AABBCCDDEE"
        out = kmer_shuffle(s, k=2, rng=np.random.default_rng(1))
        assert sorted(out[i:i+2] for i in range(0, 10, 2)) == [
            "AA", "BB", "CC", "DD", "EE"
        ]

    def test_dinuc_shuffle_preserves_dinucs(self, random_dna):
        s = random_dna(400)

        def dinuc_counts(x):
            from collections import Counter

            return Counter(x[i:i+2] for i in range(len(x) - 1))

        out = dinuc_shuffle(s, rng=np.random.default_rng(0))
        assert len(out) == len(s)
        assert dinuc_counts(out) == dinuc_counts(s)
        assert out != s  # overwhelmingly likely for 400bp

    def test_dinuc_shuffle_multi(self, random_dna):
        outs = dinuc_shuffle(random_dna(100), num_shufs=3,
                             rng=np.random.default_rng(0))
        assert len(outs) == 3


class TestSyntheticAndOOD:
    def test_synthetic_generators(self):
        import random as pyrandom

        from jaeger_tpu.seqops import synthetic as syn

        pyrandom.seed(0)
        assert syn.generate_homopolymer(5, "G") == "GGGGG"
        assert syn.generate_tandem_repeat("AT", 3) == "ATATAT"
        reps = syn.generate_random_tandem_repeats(3)
        assert all(len(r) <= 2048 for r in reps)
        seq = "ATGC" * 100
        out = syn.apply_n_stretch(seq, (0.2, 0.3))
        assert len(out) == len(seq)
        frac = out.count("N") / len(out)
        assert 0.15 <= frac <= 0.35
        out2 = syn.apply_tandem_repeat_window(seq)
        assert len(out2) == len(seq)
        mix = syn.apply_mix(["A" * 50, "G" * 50], output_length=60)
        assert len(mix) == 60

    def test_ood_builder(self, tmp_path, random_dna):
        src = tmp_path / "in.csv"
        src.write_text("".join(f"1,{random_dna(100)}\n" for _ in range(5)))
        out = tmp_path / "ood.csv"
        from jaeger_tpu.dataops.ood import shuffle_core

        summary = shuffle_core(str(src), str(out), method="dinuc",
                               n_shuffles=2, tandem_repeats=3)
        assert summary["id"] == 5
        assert summary["ood"] == 13
        lines = out.read_text().strip().split("\n")
        assert len(lines) == 18

    def test_split_core(self, tmp_path, random_dna):
        from jaeger_tpu.dataops.split import split_core
        from jaeger_tpu.seqops.fasta import read_fasta

        src = tmp_path / "genome.fasta"
        src.write_text(f">g1\n{random_dna(20000)}\n")
        out = tmp_path / "frags.fasta"
        n = split_core(str(src), str(out), minlen=1000, maxlen=2000,
                       seed=1)
        assert n >= 10
        frags = list(read_fasta(out))
        assert all(1000 <= len(s) <= 2000 for _, s in frags)

    def test_split_coverage(self, tmp_path, random_dna):
        from jaeger_tpu.dataops.split import split_core

        src = tmp_path / "genome.fasta"
        src.write_text(f">g1\n{random_dna(10000)}\n")
        out = tmp_path / "cov.fasta"
        n = split_core(str(src), str(out), minlen=500, maxlen=500,
                       coverage=2.0, seed=1)
        assert n >= 35  # ~2x coverage of 10kb at 500bp


class TestUtilsCommands:
    def test_mask_core(self, tmp_path, random_dna):
        from jaeger_tpu.commands.utils import mask_core

        src = tmp_path / "in.fasta"
        src.write_text(f">s1\n{random_dna(200)}\n")
        out = tmp_path / "masked.fasta"
        n = mask_core(str(src), str(out), minperc=0.0, maxperc=0.05,
                      step=0.01, seed=0)
        assert n == 6  # 0.00 .. 0.05
        text = out.read_text()
        assert "_mutperc_5.00" in text

    def test_convert_roundtrip(self, tmp_path, random_dna):
        from jaeger_tpu.commands.utils import convert_core

        csv = tmp_path / "in.csv"
        seqs = [(i, random_dna(50)) for i in range(4)]
        csv.write_text(
            "".join(f"{i},{s},seq{i}\n" for i, s in seqs)
        )
        fasta = tmp_path / "out.fasta"
        assert convert_core(str(csv), str(fasta), "CSV") == 4
        back = tmp_path / "back.csv"
        assert convert_core(str(fasta), str(back), "FASTA") == 4
        assert back.read_text().count("seq") == 4

    def test_fragment_core(self, tmp_path, random_dna):
        from jaeger_tpu.commands.utils import fragment_core

        src = tmp_path / "in.fasta"
        src.write_text(f">c1\n{random_dna(5000)}\n")
        out = tmp_path / "frags.csv"
        n = fragment_core(str(src), str(out), fsize=2000, label=1)
        assert n == 2
        assert out.read_text().startswith("1,")


def test_dataset_core_split_and_dedupe(tmp_path, rng):
    """utils dataset: fragment + dedupe + 80/10/10 split
    (reference commands/utils.py dataset_core)."""
    from jaeger_tpu.commands.utils import dataset_core

    fa = tmp_path / "g.fasta"
    seq = "".join(rng.choice(list("ATGC"), size=6000))
    with open(fa, "w") as fh:
        # two identical genomes: dedupe must collapse duplicate fragments
        fh.write(f">g1\n{seq}\n>g2\n{seq}\n")

    out = tmp_path / "ds"
    counts = dataset_core(str(fa), str(out), frag_len=1000, overlap=500,
                          label=3, seed=1)
    total = sum(counts.values())
    dup = dataset_core(str(fa), str(tmp_path / "ds2"), frag_len=1000,
                       overlap=500, dedupe=False, seed=1)
    assert sum(dup.values()) == 2 * total  # duplicates kept without dedupe
    # split fractions (80/10/10 of n)
    assert counts["train"] == int(total * 0.8)
    # rows are label,fragment with the requested label
    first = (tmp_path / "ds_train.csv").read_text().splitlines()[0]
    label, frag = first.split(",")
    assert label == "3" and len(frag) == 1000


def test_dataset_core_csv_input_columns(tmp_path, rng):
    """utils dataset on CSV input: --seq-col/--class-col select columns
    and per-row classes flow into the output splits (reference
    commands/utils.py:116-132 read_sequences)."""
    from jaeger_tpu.commands.utils import dataset_core

    csvp = tmp_path / "in.csv"
    with open(csvp, "w") as fh:
        for i in range(6):
            seq = "".join(rng.choice(list("ATGC"), size=2500))
            # columns: junk, class, sequence
            fh.write(f"x{i},{i % 2},{seq}\n")

    counts = dataset_core(str(csvp), str(tmp_path / "ds"), frag_len=1000,
                          overlap=0, seq_col=2, class_col=1, seed=1,
                          dedupe=False)
    rows = []
    for name in ("train", "val", "test"):
        rows += (tmp_path / f"ds_{name}.csv").read_text().splitlines()
    assert len(rows) == sum(counts.values()) > 0
    labels = {r.split(",")[0] for r in rows}
    assert labels == {"0", "1"}  # per-row classes preserved
    assert all(len(r.split(",")[1]) == 1000 for r in rows)


def test_ood_seq_col(tmp_path, rng):
    """ood-data --seq-col reads the sequence from a non-default column."""
    from jaeger_tpu.dataops.ood import shuffle_core

    csvp = tmp_path / "in.csv"
    seq = "".join(rng.choice(list("ATGC"), size=300))
    csvp.write_text(f"id0,junk,{seq}\n")
    out = tmp_path / "ood.csv"
    summary = shuffle_core(str(csvp), str(out), method="random",
                           n_shuffles=1, seq_col=2)
    assert summary["total"] == 2
    lines = out.read_text().splitlines()
    assert lines[0] == f"1,{seq}"
    assert lines[1].startswith("0,") and len(lines[1]) == len(seq) + 2


def test_convert_workers_identical(tmp_path, random_dna):
    """Parallel shard/chunk materialization is byte-identical to serial."""
    import numpy as np

    from jaeger_tpu.dataops.convert import convert_dataset

    rng = np.random.default_rng(5)
    csv = tmp_path / "in.csv"
    with open(csv, "w") as fh:
        for i in range(450):  # >4096 crop rows, so the unsharded chunk gate engages
            fh.write(f"{i % 3},{random_dna(int(rng.integers(600, 1800)))}\n")

    for kwargs in (
        {"shard_size": 64},
        {},  # unsharded chunked path (forced past the 4096 gate below)
    ):
        a = tmp_path / "a.npz"
        b = tmp_path / "b.npz"
        common = dict(format="translated", crop_size=[150, 200],
                      stride=150, balance_classes=True, pad=True,
                      **kwargs)
        convert_dataset(str(csv), str(a), workers=0, **common)
        convert_dataset(str(csv), str(b), workers=4, **common)
        da, db = np.load(a, allow_pickle=True), np.load(b, allow_pickle=True)
        assert set(da.files) == set(db.files)
        for k in da.files:
            if k.startswith("_") or k.endswith("_map"):
                assert str(da[k]) == str(db[k])
            else:
                np.testing.assert_array_equal(da[k], db[k], err_msg=k)


class TestMinHashDedupe:
    def test_sketch_canonical_strands(self, random_dna):
        from jaeger_tpu.dataops.dedupe import minhash_sketch
        from jaeger_tpu.postprocess.termini import reverse_complement

        s = random_dna(500)
        a = minhash_sketch(s)
        b = minhash_sketch(reverse_complement(s))
        np.testing.assert_array_equal(a, b)  # strand-invariant

    def test_sketch_drops_n_kmers(self):
        from jaeger_tpu.dataops.dedupe import minhash_sketch

        assert minhash_sketch("N" * 100).size == 0
        assert minhash_sketch("ACG").size == 0  # shorter than k

    def test_near_duplicates_cluster(self, random_dna):
        import numpy as np

        from jaeger_tpu.dataops.dedupe import MinHashDeduper

        rng = np.random.default_rng(0)
        base = random_dna(2000)
        # a 1%-mutated copy shares most k-mers -> duplicate at 0.6
        mutated = list(base)
        for i in rng.choice(2000, size=20, replace=False):
            mutated[i] = "ACGT"[(("ACGT".index(mutated[i])) + 1) % 4]
        mutated = "".join(mutated)
        unrelated = random_dna(2000)

        d = MinHashDeduper(threshold=0.6)
        assert not d.is_duplicate(base)
        assert d.is_duplicate(base)          # exact copy
        assert d.is_duplicate(mutated)       # near-identical copy
        assert not d.is_duplicate(unrelated)
        assert len(d) == 2

    def test_dataset_core_minhash_mode(self, tmp_path, random_dna):
        from jaeger_tpu.commands.utils import dataset_core

        g1 = random_dna(6000)
        fasta = tmp_path / "g.fasta"
        # the same genome twice under different names: minhash collapses
        # every duplicated fragment
        fasta.write_text(f">a\n{g1}\n>b\n{g1}\n")
        summary = dataset_core(
            str(fasta), str(tmp_path / "ds"), frag_len=2000,
            overlap=0, dedupe="minhash",
        )
        total = sum(summary.values())
        nodedup = dataset_core(
            str(fasta), str(tmp_path / "ds2"), frag_len=2000,
            overlap=0, dedupe=False,
        )
        assert sum(nodedup.values()) == 2 * total


def test_dataset_core_mmseqs_passthrough(tmp_path, rng):
    """--mmseqs-bin routes dereplication through a real mmseqs2
    `easy-cluster` invocation (reference commands/utils.py:170
    semantics). Pinned against a recorded-behavior fake binary that
    checks the argument contract and emits the rep_seq.fasta format;
    a missing binary raises with a pointer to the MinHash fallback."""
    import stat

    from jaeger_tpu.commands.utils import dataset_core

    fa = tmp_path / "g.fasta"
    seq = "".join(rng.choice(list("ATGC"), size=4000))
    fa.write_text(f">g1\n{seq}\n")

    # fake mmseqs: assert easy-cluster args, keep every 2nd fragment
    fake = tmp_path / "mmseqs"
    fake.write_text("""#!/bin/bash
set -e
[ "$1" = easy-cluster ] || { echo "bad subcommand $1" >&2; exit 2; }
in="$2"; prefix="$3"
[ "$5" = --min-seq-id ] || { echo "bad args: $@" >&2; exit 2; }
[ "$6" = 0.35 ] || { echo "bad min-seq-id $6" >&2; exit 2; }
[ "$7" = -c ] || exit 2
[ "$8" = 0.7 ] || { echo "bad cov $8" >&2; exit 2; }
n=0
> "${prefix}_rep_seq.fasta"
while read -r line; do
  case "$line" in
    ">"*) h="$line"; keep=$(( (n % 2) == 0 )); n=$((n+1));;
    *) if [ "$keep" = 1 ]; then printf '%s\\n%s\\n' "$h" "$line" \
         >> "${prefix}_rep_seq.fasta"; fi;;
  esac
done < "$in"
""")
    fake.chmod(fake.stat().st_mode | stat.S_IEXEC)

    counts = dataset_core(str(fa), str(tmp_path / "ds"), frag_len=1000,
                          overlap=500, label=1, seed=1,
                          mmseqs_bin=str(fake), dedupe_threshold=0.35,
                          maxcov=0.7)
    no_dedupe = dataset_core(str(fa), str(tmp_path / "ds0"),
                             frag_len=1000, overlap=500, label=1, seed=1,
                             dedupe=False)
    # the fake keeps every 2nd fragment
    assert sum(counts.values()) == (sum(no_dedupe.values()) + 1) // 2

    import pytest as _pytest

    with _pytest.raises(FileNotFoundError, match="MinHash"):
        dataset_core(str(fa), str(tmp_path / "ds1"), frag_len=1000,
                     overlap=500, label=1, mmseqs_bin="/nonexistent/mmseqs")


def test_dataset_core_dedupe_none_wins_over_mmseqs_bin(tmp_path, rng):
    """An explicit --dedupe none disables dereplication even when
    --mmseqs-bin is also given (the binary flag must not silently
    shrink a dataset the user asked to keep whole)."""
    from jaeger_tpu.commands.utils import dataset_core

    fa = tmp_path / "g.fasta"
    seq = "".join(rng.choice(list("ATGC"), size=4000))
    fa.write_text(f">g1\n{seq}\n")

    # a binary that would fail loudly if ever invoked
    fake = tmp_path / "mmseqs"
    fake.write_text("#!/bin/bash\nexit 9\n")
    fake.chmod(0o755)

    kept = dataset_core(str(fa), str(tmp_path / "ds"), frag_len=1000,
                        overlap=500, label=1, seed=1, dedupe=False,
                        mmseqs_bin=str(fake))
    baseline = dataset_core(str(fa), str(tmp_path / "ds0"), frag_len=1000,
                            overlap=500, label=1, seed=1, dedupe=False)
    assert sum(kept.values()) == sum(baseline.values())


def test_mmseqs_failure_surfaces_stderr(tmp_path, rng):
    """A failing mmseqs binary raises with its stderr in the message,
    not a bare CalledProcessError."""
    import pytest as _pytest

    from jaeger_tpu.commands.utils import dataset_core

    fa = tmp_path / "g.fasta"
    seq = "".join(rng.choice(list("ATGC"), size=4000))
    fa.write_text(f">g1\n{seq}\n")
    fake = tmp_path / "mmseqs"
    fake.write_text("#!/bin/bash\necho 'tmpdir exploded' >&2\nexit 3\n")
    fake.chmod(0o755)

    with _pytest.raises(RuntimeError, match="tmpdir exploded"):
        dataset_core(str(fa), str(tmp_path / "ds"), frag_len=1000,
                     overlap=500, label=1, seed=1, mmseqs_bin=str(fake))
