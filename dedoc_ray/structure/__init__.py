from dedoc_ray.structure.patterns import PatternComposition, default_patterns
from dedoc_ray.structure.tree import construct_tree, extract_structure, flatten_tree

__all__ = ["PatternComposition", "default_patterns", "construct_tree", "extract_structure", "flatten_tree"]
