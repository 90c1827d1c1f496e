"""Prompt asset loader. Assets live next to this file; user overrides may be
given as absolute paths."""

import os

_DIR = os.path.dirname(__file__)


def load_prompt(name_or_path: str) -> str:
    path = name_or_path if os.path.isabs(name_or_path) else os.path.join(_DIR, name_or_path)
    with open(path, "r", encoding="utf-8") as f:
        return f.read()
