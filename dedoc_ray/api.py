"""HTTP API facade — the reference's ``POST /upload`` surface.

Reference: ``dedoc/api/dedoc_api.py:62-105`` (FastAPI) hands the uploaded
file + form parameters to a pre-forked child holding ONE warm
``DedocManager`` (``api/process_handler.py:21-110``), then renders the
ParsedDocument per ``return_format``.

Here the same contract runs on Flask (the HTTP stack available in this
environment): one warm ``DedocRayManager`` per app (= the reference's
warm child process), multipart ``file`` + form fields as QueryParameters
strings, and the same return_format switch — ``json``/``tree`` → the
ParsedDocument JSON, ``html``/``plain_text`` → rendered text. Single
documents are below the distribution grain, so no Ray session is touched
(corpus work goes through ``pipeline/extract.py``); the app can run
inside a driver or behind any WSGI server.

Endpoints:
  GET  /            — service banner (reference dedoc_api.py root page)
  GET  /version     — engine version string
  POST /upload      — parse one document
"""

from __future__ import annotations

import json
from typing import Optional

from dedoc_ray.manager import DedocRayManager


def create_app(manager: Optional[DedocRayManager] = None):
    from flask import Flask, Response, request

    app = Flask("dedoc_ray")
    mgr = manager or DedocRayManager()

    @app.get("/")
    def root() -> Response:
        return Response(
            "dedoc_ray: Ray-Data-native document extraction. POST /upload with a "
            "multipart 'file' and QueryParameters form fields.",
            mimetype="text/plain",
        )

    @app.get("/version")
    def version() -> Response:
        import dedoc_ray

        return Response(dedoc_ray.__version__, mimetype="text/plain")

    @app.post("/upload")
    def upload() -> Response:
        if "file" not in request.files:
            # reference dedoc_api returns 422 for a missing file part
            # (test_api_misc_main.test_send_wo_file)
            return Response(
                json.dumps({"detail": "no file field in multipart body"}),
                status=422,
                mimetype="application/json",
            )
        f = request.files["file"]
        parameters = {k: v for k, v in request.form.items()}
        file_name = f.filename or "document"
        try:
            parsed = mgr.parse(data=f.read(), file_name=file_name, parameters=parameters)
        except ValueError as e:
            # invalid QueryParameters → 400 (reference: structure_type
            # "bagel" etc., test_api_misc_structure.test_incorrect_structure)
            return Response(
                json.dumps({"detail": str(e)}), status=400, mimetype="application/json"
            )
        if parsed.get("status") == "bad_file":
            # UnsupportedFileFormat → 415 with version + file_name + metadata
            # (test_api_misc_main.test_bin_file)
            import dedoc_ray

            return Response(
                json.dumps({
                    "dedoc_version": dedoc_ray.__version__,
                    "file_name": file_name,
                    "metadata": parsed.get("metadata") or {},
                    "detail": parsed.get("error_msg", "unsupported format"),
                }, ensure_ascii=False),
                status=415,
                mimetype="application/json",
            )
        fmt = parameters.get("return_format", "json")
        if fmt == "html":
            return Response(parsed["content"], mimetype="text/html")
        if fmt == "plain_text":
            return Response(parsed["extracted_text"], mimetype="text/plain")
        return Response(
            json.dumps(parsed, default=str, ensure_ascii=False),
            mimetype="application/json",
        )

    return app
