from . import jsonl, prng, timing, tree  # noqa: F401
