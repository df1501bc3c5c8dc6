"""Render the proportional-font atlas asset the multifont recognizer
learns from (readers/data/scan_atlas_prop.pgm) — the committed-artifact
flow used for every trained model in this repo (cf. readers/txtlayer.py
weights). Re-run after changing the writer's proportional font."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from dedoc_ray.readers.scan_ocr import CHARSET
from dedoc_ray.sources.scan_writer import pgm_bytes, render_prop_atlas

out = os.path.join(os.path.dirname(__file__), "..", "dedoc_ray", "readers", "data", "scan_atlas_prop.pgm")
with open(out, "wb") as f:
    f.write(pgm_bytes(render_prop_atlas()))
charset_out = out.replace(".pgm", ".charset.txt")
with open(charset_out, "w") as f:
    f.write(CHARSET.replace(" ", ""))
print(f"wrote {out} + charset ({len(CHARSET.replace(' ', ''))} glyphs)")
