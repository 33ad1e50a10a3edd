"""Flat .npz (de)serialisation of parameter pytrees.

The model-asset analog of the reference's .onnx files
(/root/reference/models/segmentation/CMakeLists.txt): converters write these
bundles offline; the runtime loads them lazily. Nested dicts/lists flatten to
path keys ("encoder/stages/0/blocks/1/conv1/w")."""

from __future__ import annotations

from typing import Any, Dict, List, Union

import numpy as np

Tree = Union[Dict[str, Any], List[Any], np.ndarray]


def flatten_tree(tree: Tree, prefix: str = "") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(flatten_tree(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(flatten_tree(v, f"{prefix}{i}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def unflatten_tree(flat: Dict[str, np.ndarray]) -> Tree:
    root: Dict[str, Any] = {}
    for path, value in flat.items():
        parts = path.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value

    def listify(node):
        if not isinstance(node, dict):
            return node
        keys = list(node.keys())
        if keys and all(k.isdigit() for k in keys):
            return [listify(node[str(i)]) for i in range(len(keys))]
        return {k: listify(v) for k, v in node.items()}

    return listify(root)


def save_pytree(path, tree: Tree) -> None:
    np.savez(path, **flatten_tree(tree))


def load_pytree(path) -> Tree:
    with np.load(path) as data:
        return unflatten_tree({k: data[k] for k in data.files})
