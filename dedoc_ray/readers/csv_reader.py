"""CSV/TSV kernel — whole payload becomes one Table
(reference dedoc/readers/csv_reader/csv_reader.py:17-58: pandas read_csv with
no header, string dtype, keep_default_na=False)."""

from __future__ import annotations

import hashlib
import io
from typing import Optional

import pandas as pd

from dedoc_ray.core.line import LineMetadata, LineWithMeta
from dedoc_ray.core.table import CellWithMeta, Table
from dedoc_ray.readers.base import UnstructuredDoc
from dedoc_ray.readers.txt import _detect_encoding


def read_csv(data: bytes, delimiter: Optional[str] = None, encoding: Optional[str] = None) -> UnstructuredDoc:
    sep = delimiter if delimiter is not None else ("\t" if b"\t" in data.split(b"\n", 1)[0] else ",")
    enc = encoding or _detect_encoding(data)
    df = pd.read_csv(io.BytesIO(data), sep=sep, header=None, encoding=enc, dtype="string", keep_default_na=False)
    file_hash = hashlib.md5(data).hexdigest()
    cells = []
    line_id = 0
    for ind in df.index:
        row = []
        for cell in df.loc[ind]:
            row.append(CellWithMeta(lines=[LineWithMeta(line=str(cell), metadata=LineMetadata(page_id=0, line_id=line_id))]))
            line_id += 1
        cells.append(row)
    table = Table(cells=cells, page_id=0, uid=f"{file_hash}_table_0")
    return UnstructuredDoc(tables=[table], warnings=[f"delimiter is '{sep}'", f"encoding is {enc}"])
