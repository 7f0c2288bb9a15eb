"""Recorded-fixture test for the model download/catalog path (round-5
verdict item 8).

The live CKAN catalog is unreachable in this image, so the
parse → download → extract → register pipeline is pinned against a
canned CKAN ``package_search`` response and a tiny model tarball served
from a local HTTP server — exercising the SUCCESS path end-to-end
(reference ``commands/downloads.py:12-51``), not just the error branch.
"""

import io
import json
import tarfile
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest
import yaml

from jaeger_tpu.utils import registry


#: shape mirrors a real CKAN /api/3/action/package_search response
CKAN_FIXTURE = {
    "success": True,
    "result": {
        "count": 1,
        "results": [
            {
                "name": "jaeger-models",
                "resources": [
                    {"name": "jaeger_test_1.4M",
                     "id": "res-1",
                     "url": None},      # placeholder, filled per-server
                    {"name": "readme", "id": "res-2", "url": ""},
                ],
            }
        ],
    },
}


def _model_tar() -> bytes:
    """A minimal valid model bundle tarball (params + project.yaml)."""
    buf = io.BytesIO()
    project = yaml.safe_dump(
        {"model": {"name": "jaeger_test_1.4M",
                   "classifier_out_dim": 2}})
    with tarfile.open(fileobj=buf, mode="w:gz") as tf:
        for name, data in (
            ("bundle/params.msgpack", b"\x81\xa6params\x80"),
            ("bundle/project.yaml", project.encode()),
            ("bundle/classes.yaml", b"0: a\n1: b\n"),
        ):
            info = tarfile.TarInfo(name)
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
    return buf.getvalue()


@pytest.fixture()
def catalog_server():
    tar_bytes = _model_tar()

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            if self.path.startswith("/api"):
                fixture = json.loads(json.dumps(CKAN_FIXTURE))
                res = fixture["result"]["results"][0]["resources"]
                res[0]["url"] = (
                    f"http://127.0.0.1:{self.server.server_port}"
                    f"/models/jaeger_test.tar.gz")
                body = json.dumps(fixture).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            elif self.path.endswith(".tar.gz"):
                self.send_response(200)
                self.send_header("Content-Type", "application/gzip")
                self.send_header("Content-Length", str(len(tar_bytes)))
                self.end_headers()
                self.wfile.write(tar_bytes)
            else:
                self.send_response(404)
                self.end_headers()

        def log_message(self, *a):  # quiet
            pass

    srv = HTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        yield f"http://127.0.0.1:{srv.server_port}"
    finally:
        srv.shutdown()
        t.join(timeout=5)


def test_catalog_parse(catalog_server):
    links = registry.list_model_catalog(
        api_url=f"{catalog_server}/api/3/action/package_search",
        query="jaeger")
    assert list(links) == ["jaeger_test_1.4M"]
    assert links["jaeger_test_1.4M"].endswith(".tar.gz")


def test_download_extract_register_roundtrip(catalog_server, tmp_path):
    links = registry.list_model_catalog(
        api_url=f"{catalog_server}/api/3/action/package_search",
        query="jaeger")
    reg_path = tmp_path / "config.json"
    registered = registry.download_models(
        links["jaeger_test_1.4M"], tmp_path / "models",
        registry_path=reg_path)
    assert len(registered) == 1
    reg = json.loads(reg_path.read_text())
    assert registered[0] in reg["model_paths"]
    # the registered bundle is discoverable + resolvable by name
    avail = registry.AvailableModels(registry_path=reg_path)
    assert "jaeger_test_1.4M" in avail.info
    resolved = avail.resolve("jaeger_test_1.4M")
    assert (tmp_path / "models") in __import__("pathlib").Path(
        resolved).parents


def test_catalog_unsuccessful_response(catalog_server, monkeypatch):
    monkeypatch.setitem(CKAN_FIXTURE, "success", False)
    with pytest.raises(ValueError):
        registry.list_model_catalog(
            api_url=f"{catalog_server}/api/3/action/package_search",
            query="jaeger")
    monkeypatch.setitem(CKAN_FIXTURE, "success", True)


def test_catalog_unreachable_message():
    with pytest.raises(ConnectionError, match="air-gapped"):
        registry.list_model_catalog(
            api_url="http://127.0.0.1:9/api", query="jaeger",
            timeout=0.5)
