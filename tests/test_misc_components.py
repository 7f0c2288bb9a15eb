"""Legacy models, TFRecord IO, packing, multihost helpers, device reduce."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


class TestLegacy:
    def test_wres_forward(self):
        from jaeger_tpu.models.legacy import WResModel, encode_amino_windows

        rng = np.random.default_rng(0)
        bases = jnp.asarray(rng.integers(0, 4, (2, 155), dtype=np.uint8))
        lengths = jnp.full((2,), 155, jnp.int32)
        toks = encode_amino_windows(bases, lengths, 155)
        assert int(toks.max()) <= 21  # amino vocab 22 with +1 shift
        m = WResModel()
        v = m.init({"params": jax.random.PRNGKey(0),
                    "dropout": jax.random.PRNGKey(1)}, toks, train=False)
        out = m.apply(v, toks, train=False)
        assert out["output"].shape == (2, 4)
        assert out["embedding"].shape == (2, 128)

    def test_lstm_forward(self):
        from jaeger_tpu.models.legacy import LSTMModel, encode_amino_windows

        rng = np.random.default_rng(0)
        bases = jnp.asarray(rng.integers(0, 4, (2, 155), dtype=np.uint8))
        lengths = jnp.full((2,), 155, jnp.int32)
        toks = encode_amino_windows(bases, lengths, 155)
        m = LSTMModel()
        v = m.init({"params": jax.random.PRNGKey(0),
                    "dropout": jax.random.PRNGKey(1)}, toks, train=False)
        out = m.apply(v, toks, train=False)
        assert out["output"].shape == (2, 4)


class TestTFRecord:
    def test_roundtrip(self, tmp_path):
        from jaeger_tpu.train.tfrecord import (
            build_example, iter_tfrecords, parse_example, write_tfrecord,
        )

        ex1 = build_example({
            "translated": np.arange(12, dtype=np.int64),
            "label": np.array([2], dtype=np.int64),
            "weight": np.array([0.5, 1.5], dtype=np.float32),
            "name": b"contig_1",
        })
        ex2 = build_example({"label": np.array([0], dtype=np.int64)})
        path = tmp_path / "data.tfrecord"
        write_tfrecord(path, [ex1, ex2])
        records = [parse_example(p) for p in iter_tfrecords(path)]
        assert len(records) == 2
        np.testing.assert_array_equal(records[0]["translated"],
                                      np.arange(12))
        assert records[0]["label"][0] == 2
        np.testing.assert_allclose(records[0]["weight"], [0.5, 1.5])
        assert records[0]["name"][0] == b"contig_1"

    def test_corruption_detected(self, tmp_path):
        from jaeger_tpu.train.tfrecord import iter_tfrecords, write_tfrecord

        path = tmp_path / "c.tfrecord"
        write_tfrecord(path, [b"hello world payload"])
        data = bytearray(path.read_bytes())
        data[15] ^= 0xFF  # flip a payload byte
        path.write_bytes(bytes(data))
        with pytest.raises(ValueError):
            list(iter_tfrecords(path))


class TestPacking:
    def test_roundtrip_odd_even(self):
        from jaeger_tpu.ops.encode import pack_bases, unpack_bases

        rng = np.random.default_rng(0)
        for L in (10, 11, 1505):
            b = rng.integers(0, 9, size=(3, L), dtype=np.uint8)
            p = pack_bases(b)
            u = np.asarray(unpack_bases(jnp.asarray(p), L))
            np.testing.assert_array_equal(u, b)

    def test_engine_packed_matches_unpacked(self):
        from jaeger_tpu.infer.engine import InferenceEngine
        from jaeger_tpu.models.builder import ModelBuilder
        from tests.test_parallel import CONFIG

        b = ModelBuilder(CONFIG)
        model, variables = b.init()
        _, crop_nt = b.crop
        rng = np.random.default_rng(0)
        bases = rng.integers(0, 5, size=(12, crop_nt), dtype=np.uint8)
        lengths = np.full((12,), crop_nt, np.int32)
        packed = InferenceEngine(model, variables, batch_size=8,
                                 pack_transfer=True)
        plain = InferenceEngine(model, variables, batch_size=8,
                                pack_transfer=False)
        np.testing.assert_allclose(
            packed.predict_windows(bases, lengths)["prediction"],
            plain.predict_windows(bases, lengths)["prediction"],
            rtol=1e-5, atol=1e-5,
        )


class TestMultihost:
    def test_contig_owner_deterministic(self):
        from jaeger_tpu.parallel.multihost import (
            contig_owner, filter_contigs_for_host,
        )

        names = [f"contig_{i}" for i in range(100)]
        owners = [contig_owner(n, 4) for n in names]
        assert owners == [contig_owner(n, 4) for n in names]
        assert set(owners) == {0, 1, 2, 3}
        # every contig to exactly one host
        records = [(n, "ATGC") for n in names]
        assigned = []
        for h in range(4):
            assigned += [
                n for n, _ in filter_contigs_for_host(records, h, 4)
            ]
        assert sorted(assigned) == sorted(names)

    def test_merge_shards(self, tmp_path):
        from jaeger_tpu.parallel.multihost import (
            merge_output_shards, shard_path,
        )

        base = tmp_path / "out.tsv"
        for h in range(3):
            shard_path(base, h).write_text(
                "contig_id\tscore\n" + f"c{h}\t{h}\n"
            )
        merged = merge_output_shards(base, 3)
        lines = merged.read_text().strip().split("\n")
        assert lines[0] == "contig_id\tscore"
        assert len(lines) == 4


class TestDeviceReduce:
    def test_contig_partials_match_host(self):
        from jaeger_tpu.ops.reduce import ContigAccumulator, contig_partials

        rng = np.random.default_rng(0)
        n, C = 32, 3
        logits = rng.normal(size=(n, C)).astype(np.float32)
        rel = rng.normal(size=(n, 1)).astype(np.float32)
        # 3 contigs: windows 0-9, 10-24, 25-31; batch split at 16
        contig = np.array([0] * 10 + [1] * 15 + [2] * 7)
        acc = ContigAccumulator(num_classes=C, with_reliability=True)
        for lo, hi in [(0, 16), (16, 32)]:
            ids = contig[lo:hi]
            base = ids - ids[0]
            partial = contig_partials(
                jnp.asarray(logits[lo:hi]),
                jnp.asarray(base, jnp.int32),
                jnp.ones(hi - lo, bool),
                num_segments=16,
                reliability=jnp.asarray(rel[lo:hi]),
            )
            seg_to_contig = np.arange(16) + ids[0]
            acc.add_batch(
                {k: np.asarray(v) for k, v in partial.items()},
                seg_to_contig, ids,
            )
        stats = acc.finalize()
        assert set(stats) == {0, 1, 2}
        for g, (lo, hi) in zip([0, 1, 2], [(0, 10), (10, 25), (25, 32)]):
            sl = logits[lo:hi]
            np.testing.assert_allclose(
                np.asarray(stats[g]["pred_sum"], np.float32),
                sl.mean(axis=0).astype(np.float16).astype(np.float32),
                rtol=2e-3, atol=2e-3,
            )
            np.testing.assert_allclose(
                np.asarray(stats[g]["pred_var"], np.float32),
                sl.var(axis=0).astype(np.float16).astype(np.float32),
                rtol=5e-3, atol=5e-3,
            )
            np.testing.assert_array_equal(
                stats[g]["frag_pred"], np.argmax(sl, axis=1)
            )
            assert stats[g]["n_windows"] == hi - lo
            frac = (1 / (1 + np.exp(-rel[lo:hi, 0])) > 0.5).mean()
            assert float(stats[g]["reliability"]) == pytest.approx(
                frac, abs=1e-3
            )


def test_vitra_forward():
    from jaeger_tpu.models.legacy import Vitra, encode_amino_windows

    rng = np.random.default_rng(0)
    bases = jnp.asarray(rng.integers(0, 4, (2, 155), dtype=np.uint8))
    lengths = jnp.full((2,), 155, jnp.int32)
    toks = encode_amino_windows(bases, lengths, 155)
    m = Vitra(transformer_layers=2, num_heads=2)
    v = m.init({"params": jax.random.PRNGKey(0),
                "dropout": jax.random.PRNGKey(1)}, toks, train=False)
    out = m.apply(v, toks, train=False)
    assert out["output"].shape == (2, 4)
    assert np.isfinite(np.asarray(out["output"])).all()


def test_wheel_packages_data_and_native_source(tmp_path):
    """Wheel build includes bundled data, models, and the C++ source
    (role parity: reference test_pyproject wheel-content checks)."""
    import subprocess
    import sys
    import zipfile
    from pathlib import Path

    repo = Path(__file__).resolve().parent.parent
    res = subprocess.run(
        [sys.executable, "-m", "pip", "wheel", "--no-deps",
         "--no-build-isolation", "-w", str(tmp_path), str(repo)],
        capture_output=True, text=True, timeout=300,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    whl = next(tmp_path.glob("jaeger_tpu-*.whl"))
    names = set(zipfile.ZipFile(whl).namelist())
    for probe in (
        "jaeger_tpu/data/test/test_contigs.fasta",
        "jaeger_tpu/data/models/demo/params.msgpack",
        "jaeger_tpu/data/models/default/WRes_1024.h5",
        "jaeger_tpu/native/jaeger_host.cpp",
        "jaeger_tpu/cli.py",
    ):
        assert probe in names, probe
    # the prebuilt .so must NOT ship (rebuilt per host)
    assert not any(n.endswith(".so") for n in names)


def test_model_catalog_parsing(monkeypatch):
    """CKAN catalog response -> {name: url} (reference downloads.py)."""
    import io
    import json
    import urllib.request

    import pytest

    from jaeger_tpu.utils import registry

    payload = {
        "success": True,
        "result": {"results": [
            {"resources": [
                {"name": "jaeger_1.4M_fragment", "url": "https://x/a.tar.gz"},
                {"name": "jaeger_1.9M_fragment", "url": "https://x/b.tar.gz"},
                {"id": "no-url-resource"},
            ]},
        ]},
    }

    class FakeResp(io.BytesIO):
        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    def fake_urlopen(url, timeout=None):
        assert "package_search" in url and "q=jaeger" in url
        return FakeResp(json.dumps(payload).encode())

    monkeypatch.setattr(urllib.request, "urlopen", fake_urlopen)
    links = registry.list_model_catalog()
    assert links == {"jaeger_1.4M_fragment": "https://x/a.tar.gz",
                     "jaeger_1.9M_fragment": "https://x/b.tar.gz"}

    monkeypatch.setattr(
        urllib.request, "urlopen",
        lambda *a, **k: (_ for _ in ()).throw(OSError("no network")))
    with pytest.raises(ConnectionError, match="air-gapped"):
        registry.list_model_catalog()
