"""Arrow schemas — the wire format of the engine (SURVEY.md §1.3, FIXTURES §4)."""

from __future__ import annotations

import pyarrow as pa

# input corpus row (BASELINE.json input_hint)
PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
        ("shard", pa.int32()),  # partition / checkpoint unit
    ]
)

NODE_TYPE = pa.struct(
    [
        ("node_id", pa.string()),
        ("line_type", pa.string()),
        ("level_1", pa.int32()),
        ("level_2", pa.float32()),
        ("text_start", pa.int64()),
        ("text_end", pa.int64()),
    ]
)

ANNOTATION_TYPE = pa.struct(
    [
        ("node_id", pa.string()),
        ("start", pa.int32()),
        ("end", pa.int32()),
        ("name", pa.string()),
        ("value", pa.string()),
    ]
)

CELL_TYPE = pa.struct(
    [
        ("text", pa.string()),
        ("colspan", pa.int8()),
        ("rowspan", pa.int8()),
        ("invisible", pa.bool_()),
    ]
)

TABLE_TYPE = pa.struct(
    [
        ("page_id", pa.int32()),
        ("uid", pa.string()),
        ("cells", pa.list_(pa.list_(CELL_TYPE))),
    ]
)

ATTACHMENT_TYPE = pa.struct(
    [
        ("name", pa.string()),
        ("size", pa.int64()),
        # deterministic md5-based analogue of the reference attach_{uuid4}
        # uid (attached_file.py) — attach annotations point at this
        ("uid", pa.string()),
        # filled only under return_base64 (reference api_args return_base)
        ("base64", pa.string()),
    ]
)

# document-level metadata (reference base_metadata_extractor.py:33 +
# docx core-properties / eml headers); empty strings when absent
METADATA_TYPE = pa.struct(
    [
        ("title", pa.string()),
        ("author", pa.string()),
        ("created", pa.string()),
        ("modified", pa.string()),
        ("subject", pa.string()),
        # PDF /Info extension fields (reference PdfMetadataExtractor,
        # pdf_metadata_extractor.py:28-58): null on non-PDF rows; the two
        # dates are ISO/IEC 8824 D: strings converted to unix seconds
        ("producer", pa.string()),
        ("creator", pa.string()),
        ("keywords", pa.string()),
        ("creation_date", pa.int64()),
        ("modification_date", pa.int64()),
        # image EXIF extension fields (reference ImageMetadataExtractor,
        # image_metadata_extractor.py:28-118): null on non-image rows
        ("software", pa.string()),
        ("make", pa.string()),
        ("model", pa.string()),
        ("orientation", pa.int32()),
        ("date_time", pa.int64()),
        ("exif_image_width", pa.int32()),
        ("exif_image_height", pa.int32()),
    ]
)

EXTRACTED_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("lang", pa.string()),
        ("shard", pa.int32()),
        ("status", pa.string()),  # ok | low_confidence | bad_file | parse_error
        ("format", pa.string()),  # html | txt | csv | json | pdf | docx | xlsx | pptx | eml | mhtml | archive | bad_file
        ("extracted_text", pa.string()),
        ("nodes", pa.list_(NODE_TYPE)),
        ("annotations", pa.list_(ANNOTATION_TYPE)),
        ("tables", pa.list_(TABLE_TYPE)),
        ("attachments", pa.list_(ATTACHMENT_TYPE)),
        ("metadata", METADATA_TYPE),
        ("warnings", pa.list_(pa.string())),
        ("error_msg", pa.string()),
        # mean OCR match confidence when the open-font recognizer decoded a
        # real scan (null on every non-OCR row); rows below the 0.5 floor
        # are classed status=low_confidence so 100-TB pipelines can gate on
        # either signal instead of parsing a warning string
        ("ocr_conf", pa.float32()),
        ("n_nodes", pa.int32()),
        ("n_tables", pa.int32()),
        ("n_bytes", pa.int64()),
    ]
)
