"""GROBID-shaped service stage: bounded in-flight, retry/backoff, warnings.

Runs a stdlib http.server mock with injected failures (503-then-success,
permanent 400, slow responses) and asserts the client's retry policy, the
concurrency cap, and the kernel's PDF→TEI→UnstructuredDoc route."""

import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from dedoc_ray.readers.grobid_client import GrobidClient

_TEI = b"""<?xml version="1.0"?>
<TEI xmlns="http://www.tei-c.org/ns/1.0">
 <teiHeader><fileDesc><titleStmt><title>Mock Article</title></titleStmt>
 <sourceDesc><biblStruct><analytic>
   <author><persName><forename>Ada</forename><surname>Byron</surname></persName></author>
 </analytic></biblStruct></sourceDesc></fileDesc></teiHeader>
 <text><body><div><head n="1">Intro</head><p>Body text here.</p></div></body></text>
</TEI>"""


class _State:
    def __init__(self):
        self.fail_next = 0          # respond 503 this many times
        self.permanent_code = None  # fixed status for every request
        self.delay_s = 0.0
        self.hits = 0
        self.concurrent = 0
        self.max_concurrent = 0
        self.lock = threading.Lock()


def _make_handler(state: _State):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # silent
            pass

        def do_GET(self):
            if self.path == "/api/isalive":
                self.send_response(200)
                self.end_headers()
                self.wfile.write(b"true")
            else:
                self.send_response(404)
                self.end_headers()

        def do_POST(self):
            with state.lock:
                state.hits += 1
                state.concurrent += 1
                state.max_concurrent = max(state.max_concurrent, state.concurrent)
            try:
                self.rfile.read(int(self.headers.get("Content-Length", 0)))
                if state.delay_s:
                    time.sleep(state.delay_s)
                with state.lock:
                    if state.permanent_code is not None:
                        code = state.permanent_code
                    elif state.fail_next > 0:
                        state.fail_next -= 1
                        code = 503
                    else:
                        code = 200
                self.send_response(code)
                self.end_headers()
                if code == 200:
                    self.wfile.write(_TEI)
            finally:
                with state.lock:
                    state.concurrent -= 1

    return Handler


@pytest.fixture()
def mock_grobid():
    state = _State()
    server = ThreadingHTTPServer(("127.0.0.1", 0), _make_handler(state))
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    url = f"http://127.0.0.1:{server.server_port}"
    yield url, state
    server.shutdown()


def test_is_alive_and_success(mock_grobid):
    url, state = mock_grobid
    c = GrobidClient(url)
    assert c.is_alive()
    tei, warning = c.process(b"%PDF-1.4 fake")
    assert warning == "" and tei is not None and b"Mock Article" in tei


def test_retry_on_503_then_success(mock_grobid):
    url, state = mock_grobid
    state.fail_next = 2
    c = GrobidClient(url, retries=3, backoff_s=0.01)
    tei, warning = c.process(b"%PDF-")
    assert tei is not None and warning == ""
    assert state.hits == 3  # two 503s + the success


def test_retries_exhausted_surface_warning(mock_grobid):
    url, state = mock_grobid
    state.permanent_code = 503
    c = GrobidClient(url, retries=2, backoff_s=0.01)
    tei, warning = c.process(b"%PDF-")
    assert tei is None and "503" in warning
    assert state.hits == 3  # initial + 2 retries


def test_permanent_4xx_fails_fast(mock_grobid):
    url, state = mock_grobid
    state.permanent_code = 400
    c = GrobidClient(url, retries=3, backoff_s=0.01)
    tei, warning = c.process(b"not a pdf")
    assert tei is None and "400" in warning
    assert state.hits == 1  # malformed input: no retry


def test_connection_refused_warning():
    c = GrobidClient("http://127.0.0.1:1", retries=1, backoff_s=0.01, timeout_s=0.5)
    tei, warning = c.process(b"%PDF-")
    assert tei is None and "doesn't response" in warning


def test_bounded_in_flight(mock_grobid):
    url, state = mock_grobid
    state.delay_s = 0.05
    c = GrobidClient(url, max_in_flight=3, retries=0)
    results = c.process_batch([b"%PDF-" + bytes([i]) for i in range(12)])
    assert all(t is not None for t, _ in results)
    assert state.max_concurrent <= 3  # the cluster-wide backpressure contract


def test_kernel_routes_pdf_through_service(mock_grobid):
    url, state = mock_grobid
    from dedoc_ray.pipeline.config import PipelineConfig
    from dedoc_ray.pipeline.kernel import ExtractKernel

    k = ExtractKernel(config=PipelineConfig(article_service_url=url))
    row = k.extract_row("paper.pdf", b"%PDF-1.4\nfake body")
    assert row["status"] == "ok"
    text = row["extracted_text"]
    assert "Mock Article" in text and "Intro" in text

    # service down -> warning row, not an exception (reference behavior)
    state.permanent_code = 503
    k2 = ExtractKernel(config=PipelineConfig(article_service_url=url))
    k2.grobid.retries = 0
    row2 = k2.extract_row("paper.pdf", b"%PDF-1.4\nfake body")
    assert row2["status"] == "ok" and row2["extracted_text"] == ""
    assert any("503" in w for w in row2["warnings"])
