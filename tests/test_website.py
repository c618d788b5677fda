"""Website sidecar: endpoint behavior parity with pnglossapi.go."""

import base64
import hashlib
import subprocess
import threading
import urllib.error
import urllib.request

import pytest

from pngloss_tpu.website import make_server

ROSE = "/root/reference/suite/rose.png"


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    store = tmp_path_factory.mktemp("store")
    srv = make_server(port=0, store=str(store))
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{port}"
    srv.shutdown()


def _post_multipart(url, fields):
    boundary = "XtestboundaryX"
    body = b""
    for name, value in fields.items():
        body += (f"--{boundary}\r\n"
                 f'Content-Disposition: form-data; name="{name}"\r\n\r\n').encode()
        body += value + b"\r\n"
    body += f"--{boundary}--\r\n".encode()
    req = urllib.request.Request(url, data=body, headers={
        "Content-Type": f"multipart/form-data; boundary={boundary}"})
    return urllib.request.urlopen(req, timeout=300)


def test_compress_and_fetch_roundtrip(server, oracle):
    rose = open(ROSE, "rb").read()
    resp = _post_multipart(f"{server}/compress.cgi", {
        "file": rose, "strength": b"19", "bleed": b"2", "strip": b"0"})
    page = resp.read().decode()
    assert resp.status == 200 and "compressed" in page

    sum224 = base64.urlsafe_b64encode(hashlib.sha224(rose).digest()).decode()
    url = (f"{server}/compressed.cgi?sum224={sum224}"
           f"&strength=19&bleed=2&strip=0")
    data = urllib.request.urlopen(url, timeout=300).read()
    ref = subprocess.run([oracle, "-f", "-s", "19", "-b", "2", "-"],
                         input=rose, capture_output=True).stdout
    assert data == ref  # served image byte-identical to the C tool

    # re-compress by sum224 only (dedup path, no re-upload)
    resp = _post_multipart(f"{server}/compress.cgi", {
        "sum224": sum224.encode(), "strength": b"19", "bleed": b"2",
        "strip": b"0"})
    assert resp.status == 200


def test_post_rejects_out_of_range_params(server):
    rose = open(ROSE, "rb").read()
    # bleed=0 would divide by zero in Sierra diffusion; strength>127
    # exceeds the kernel's band table — both must 400 before compression
    for fields in ({"strength": b"19", "bleed": b"0"},
                   {"strength": b"255", "bleed": b"2"},
                   {"strength": b"19", "bleed": b"2", "strip": b"7"}):
        with pytest.raises(urllib.error.HTTPError) as e:
            _post_multipart(f"{server}/compress.cgi",
                            {"file": rose, "strip": b"0", **fields})
        assert e.value.code == 400


def test_rejects_bad_inputs(server):
    with pytest.raises(urllib.error.HTTPError) as e:
        _post_multipart(f"{server}/compress.cgi", {
            "file": b"not a png", "strength": b"19", "bleed": b"2",
            "strip": b"0"})
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(f"{server}/compressed.cgi?sum224=xx", timeout=30)
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(f"{server}/nope", timeout=30)
    assert e.value.code == 404
