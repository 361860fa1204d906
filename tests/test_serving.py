"""Serving edge (essay "Whistles" server analog): HTTP identify/fingerprint
round trip against a real corpus library."""

import http.client
import json
import threading

import numpy as np
import pytest

from lbaudiodetective_tpu.config import FingerprintConfig
from lbaudiodetective_tpu.models.fingerprint import Fingerprint
from lbaudiodetective_tpu.models.library import FingerprintLibrary
from lbaudiodetective_tpu.serving import IdentificationService, make_server
from tests.conftest import BIRDS, corpus_path


@pytest.fixture(scope="module")
def service(decoded_corpus, default_config):
    from lbaudiodetective_tpu.ops.extract import extract_fingerprint

    fps = []
    for b in BIRDS[:4]:
        pos, neg, n = extract_fingerprint(decoded_corpus[b], default_config)
        fps.append(Fingerprint.from_planes(np.asarray(pos[:n]),
                                           np.asarray(neg[:n])))
    lib = FingerprintLibrary.from_fingerprints(fps, default_config)
    return IdentificationService(lib, BIRDS[:4], default_config)


@pytest.fixture(scope="module")
def server(service):
    srv = make_server(service)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.shutdown()


def _post(server, path, payload):
    conn = http.client.HTTPConnection(*server.server_address)
    conn.request("POST", path, body=payload)
    resp = conn.getresponse()
    return resp.status, json.loads(resp.read())


def test_healthz(server):
    conn = http.client.HTTPConnection(*server.server_address)
    conn.request("GET", "/healthz")
    resp = conn.getresponse()
    assert resp.status == 200
    body = json.loads(resp.read())
    assert body == {"ok": True, "tracks": 4}


def test_identify_corpus_clip(server):
    payload = open(corpus_path("BlueTit_eql"), "rb").read()
    status, body = _post(server, "/identify", payload)
    assert status == 200
    assert body["track"] == "BlueTit"
    assert body["score"] > 0.9
    assert set(body["scores"]) == set(BIRDS[:4])


def test_fingerprint_endpoint(server):
    payload = open(corpus_path("Crow_eql"), "rb").read()
    status, body = _post(server, "/fingerprint", payload)
    assert status == 200
    assert body["n"] > 0
    fp = Fingerprint.from_string(body["fingerprint"])
    assert fp.num_subfingerprints == body["n"]


def test_garbage_payload_is_4xx(server):
    status, body = _post(server, "/identify", b"this is not audio at all")
    assert status == 400
    assert "error" in body and body.get("status") is not None


def test_unknown_path_404(server):
    status, _ = _post(server, "/nope", b"")
    assert status == 404
