"""Param-pytree helpers.

Models in this framework are pure functions over nested-dict param trees
(`{"blocks": [{"attn": {"wq": ...}}, ...]}`) rather than framework Module
objects: this keeps pjit sharding annotation, LoRA folding, and quantization
as simple tree transforms.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def tree_size(tree) -> int:
    """Total number of parameters."""
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree))


def tree_bytes(tree) -> int:
    return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(tree))


def cast_tree(tree, dtype):
    """Cast all floating-point leaves to `dtype` (keeps integer leaves)."""

    def _cast(x):
        if jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree.map(_cast, tree)


def tree_paths(tree):
    """Flat list of ('a/b/0/c', leaf) pairs with stable ordering."""
    out = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        parts = []
        for p in path:
            if isinstance(p, jax.tree_util.DictKey):
                parts.append(str(p.key))
            elif isinstance(p, jax.tree_util.SequenceKey):
                parts.append(str(p.idx))
            elif isinstance(p, jax.tree_util.GetAttrKey):
                parts.append(str(p.name))
            else:
                parts.append(str(p))
        out.append(("/".join(parts), leaf))
    return out


def update_path(tree, path: str, value):
    """Functionally set `tree[path]` where path is 'a/b/0/c'. Returns new tree."""
    parts = path.split("/")

    def _set(node, parts):
        head, rest = parts[0], parts[1:]
        if isinstance(node, (list, tuple)):
            idx = int(head)
            new = list(node)
            new[idx] = value if not rest else _set(node[idx], rest)
            return type(node)(new) if isinstance(node, tuple) else new
        new = dict(node)
        new[head] = value if not rest else _set(node[head], rest)
        return new

    return _set(tree, parts)
