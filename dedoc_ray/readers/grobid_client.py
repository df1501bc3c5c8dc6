"""GROBID-shaped external-service client — the HTTP half of ArticleReader.

The reference posts the PDF to ``/api/processFulltextDocument`` and treats
connection errors / non-200s as warnings (dedoc/readers/article_reader/
article_reader.py:25-62). This client implements the pattern an
actor-pool stage needs against any sidecar model service at corpus scale:

- stdlib-only multipart POST (urllib), no external deps;
- BOUNDED in-flight requests per actor (a semaphore gating a small thread
  pool) — N actors × max_in_flight is the cluster-wide cap on concurrent
  requests hitting the service, the backpressure contract;
- retry with exponential backoff + jitter-free determinism on 429/5xx and
  connection errors; 4xx (other than 429) fails fast — a malformed PDF
  will not get better on retry;
- per-request timeout so a hung service degrades a row, not the pipeline.

The kernel holds ONE client per actor (built in ``__init__`` — the
stateful-stage rule) and routes document_type="article" PDFs through it
when ``article_service_url`` is configured; responses are TEI/XML parsed
by readers/article.py. Failures surface as the reference's warning rows,
never exceptions, so the corpus keeps streaming.
"""

from __future__ import annotations

import threading
import time
import urllib.error
import urllib.request
from concurrent.futures import ThreadPoolExecutor
from typing import List, Optional, Tuple

_BOUNDARY = b"----dedoc-ray-grobid-boundary"


def _multipart(field: str, filename: str, payload: bytes, extra: Optional[dict] = None) -> Tuple[bytes, str]:
    parts = [
        b"--" + _BOUNDARY + b"\r\n"
        + f'Content-Disposition: form-data; name="{field}"; filename="{filename}"\r\n'.encode()
        + b"Content-Type: application/octet-stream\r\n\r\n" + payload + b"\r\n"
    ]
    for k, v in (extra or {}).items():
        parts.append(
            b"--" + _BOUNDARY + b"\r\n"
            + f'Content-Disposition: form-data; name="{k}"\r\n\r\n{v}\r\n'.encode()
        )
    parts.append(b"--" + _BOUNDARY + b"--\r\n")
    return b"".join(parts), f"multipart/form-data; boundary={_BOUNDARY.decode()}"


class GrobidClient:
    """Bounded-concurrency, retrying client for a GROBID-shaped service."""

    def __init__(
        self,
        base_url: str,
        max_in_flight: int = 8,
        retries: int = 3,
        backoff_s: float = 0.05,
        timeout_s: float = 10.0,
        auth_key: str = "",
    ) -> None:
        self.base_url = base_url.rstrip("/")
        self.process_url = f"{self.base_url}/api/processFulltextDocument"
        self.retries = retries
        self.backoff_s = backoff_s
        self.timeout_s = timeout_s
        self.headers = {"Authorization": auth_key} if auth_key else {}
        self._sem = threading.Semaphore(max_in_flight)
        self._pool = ThreadPoolExecutor(max_workers=max_in_flight)

    # -- service probes (reference checks isalive at startup)

    def is_alive(self) -> bool:
        try:
            req = urllib.request.Request(f"{self.base_url}/api/isalive", headers=self.headers)
            with urllib.request.urlopen(req, timeout=self.timeout_s) as resp:
                return resp.status == 200
        except Exception:
            return False

    # -- one document

    def process(self, pdf: bytes, filename: str = "input.pdf") -> Tuple[Optional[bytes], str]:
        """POST one PDF → (TEI bytes | None, warning). Retries 429/5xx and
        connection errors with exponential backoff; other 4xx fail fast."""
        body, ctype = _multipart("input", filename, pdf, {"teiCoordinates": "figure"})
        headers = {"Content-Type": ctype, **self.headers}
        delay = self.backoff_s
        last = ""
        for attempt in range(self.retries + 1):
            with self._sem:
                try:
                    req = urllib.request.Request(self.process_url, data=body, headers=headers, method="POST")
                    with urllib.request.urlopen(req, timeout=self.timeout_s) as resp:
                        if resp.status == 200:
                            return resp.read(), ""
                        last = f"GROBID returns code {resp.status}."
                        if resp.status not in (429,) and resp.status < 500:
                            return None, last
                except urllib.error.HTTPError as e:
                    last = f"GROBID returns code {e.code}."
                    if e.code != 429 and e.code < 500:
                        return None, last  # permanent client error: no retry
                except Exception as e:  # connection refused / timeout / reset
                    last = f"GROBID doesn't response. Check GROBID service on {self.process_url}. Exception' msg: {e}"
            if attempt < self.retries:
                time.sleep(delay)
                delay *= 2
        return None, last

    # -- a batch, bounded-concurrent (the map_batches call path)

    def process_batch(self, pdfs: List[bytes]) -> List[Tuple[Optional[bytes], str]]:
        return list(self._pool.map(self.process, pdfs))

    def close(self) -> None:
        self._pool.shutdown(wait=False)
