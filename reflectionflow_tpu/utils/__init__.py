from . import jsonl, timing, tree  # noqa: F401
