"""NoteReader — .note.pickle documents (reference
dedoc/readers/note_reader/note_reader.py:15-36: ``pickle.load`` →
``note_dict["content"]`` → one line).

The reference calls ``pickle.load`` directly, which executes arbitrary
constructors — unsafe on untrusted corpus bytes. This implementation keeps
the format but parses it with a RESTRICTED unpickler that resolves no
globals at all: plain containers/scalars (the entire Note payload) load
fine, anything carrying code is rejected as a bad file.
"""

from __future__ import annotations

import io
import pickle

from dedoc_ray.core.line import LineMetadata, LineWithMeta
from dedoc_ray.readers.base import UnstructuredDoc


class BadNoteFile(ValueError):
    pass


class _RestrictedUnpickler(pickle.Unpickler):
    def find_class(self, module: str, name: str):  # noqa: ARG002
        raise pickle.UnpicklingError(f"global '{module}.{name}' is forbidden in note files")


def read_note(data: bytes) -> UnstructuredDoc:
    try:
        note_dict = _RestrictedUnpickler(io.BytesIO(data)).load()
        text = note_dict["content"]
    except Exception as e:  # reference raises BadFileFormatError the same way
        raise BadNoteFile(f"Seems note-format is broken: {e}") from e
    if isinstance(text, bytes):
        text = text.decode()
    meta = {}
    for key in ("author", "created", "modified", "title", "subject"):
        if isinstance(note_dict, dict) and isinstance(note_dict.get(key), str):
            meta[key] = note_dict[key]
    return UnstructuredDoc(
        lines=[LineWithMeta(line=text, metadata=LineMetadata(page_id=0, line_id=0))],
        metadata=meta,
    )
