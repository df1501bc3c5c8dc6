from dedoc_ray.core.annotation import Annotation
from dedoc_ray.core.hierarchy import HierarchyLevel
from dedoc_ray.core.line import LineMetadata, LineWithMeta
from dedoc_ray.core.table import CellWithMeta, Table
from dedoc_ray.core.annotation_merger import merge_annotations

__all__ = [
    "Annotation",
    "HierarchyLevel",
    "LineMetadata",
    "LineWithMeta",
    "CellWithMeta",
    "Table",
    "merge_annotations",
]
