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


def test_static_pages_and_full_result_page(server, oracle):
    # front page: the full form (file/url inputs + the three option groups)
    page = urllib.request.urlopen(f"{server}/", timeout=30).read().decode()
    for needle in ("compress.cgi", 'name="file"', 'name="url"',
                   'name="strength"', 'name="bleed"', 'name="strip"',
                   "example.html"):
        assert needle in page, needle
    assert urllib.request.urlopen(
        f"{server}/index.html", timeout=30).status == 200
    css = urllib.request.urlopen(
        f"{server}/style.css", timeout=30)
    assert css.headers["Content-Type"] == "text/css" and css.read()
    ex = urllib.request.urlopen(
        f"{server}/example.html", timeout=30).read().decode()
    assert "david.png" in ex and "david-s40.png" in ex

    # POST returns the FULL page: compress-again form with hidden sum224,
    # pre-filled options, size/percent line and the <img>
    rose = open(ROSE, "rb").read()
    resp = _post_multipart(f"{server}/compress.cgi", {
        "file": rose, "strength": b"19", "bleed": b"2", "strip": b"0"})
    page = resp.read().decode()
    for needle in ('name="sum224"', "Compress Again", "Start Over",
                   "compressed.cgi?sum224=", "% of original",
                   'width="70" height="46"'):
        assert needle in page, needle


def test_example_images_served(server, suite_dir):
    from pngloss_tpu.webassets import format_size

    img = urllib.request.urlopen(f"{server}/david.png", timeout=30)
    assert img.read()[:8] == b"\x89PNG\r\n\x1a\n"
    img = urllib.request.urlopen(f"{server}/david-s20.png", timeout=300)
    data = img.read()
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    assert len(data) < 18000   # README.md:97-100 — ~7kB at -s 20
    # Go size formatting (pnglossapi.go:273-301)
    assert format_size(9999) == "9999B"
    assert format_size(10000) == "10kB"
    assert format_size(12_345_678) == "12MB"


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


def test_url_field_rejects_non_http_schemes(server):
    # file:// (or ftp/data) through the url field would read local files
    # and re-serve them; the reference's Go client.Get is http/https-only
    # (pnglossapi.go:189) and so are we
    for url in (b"file:///root/reference/suite/rose.png",
                b"ftp://127.0.0.1/rose.png",
                b"data:image/png;base64,AAAA"):
        with pytest.raises(urllib.error.HTTPError) as e:
            _post_multipart(f"{server}/compress.cgi", {
                "url": url, "strength": b"19", "bleed": b"2", "strip": b"0"})
        assert e.value.code == 400, url


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
