from . import text, textstats, vectors  # noqa: F401
