from . import extract_stream  # noqa: F401
