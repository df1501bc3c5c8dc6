from dedoc_ray.readers.html.reader import read_html

__all__ = ["read_html"]
