import numpy as np

from dlimgedit_tpu.utils.pytree_io import (
    flatten_tree,
    load_pytree,
    save_pytree,
    unflatten_tree,
)


def test_roundtrip(tmp_path):
    tree = {
        "a": np.arange(6).reshape(2, 3),
        "blocks": [
            {"w": np.ones((2, 2)), "b": np.zeros(2)},
            {"w": np.full((2, 2), 3.0)},
        ],
        "nested": {"x": {"y": np.float32(2.5) * np.ones(1)}},
    }
    p = tmp_path / "params.npz"
    save_pytree(p, tree)
    loaded = load_pytree(p)
    assert isinstance(loaded["blocks"], list)
    np.testing.assert_array_equal(loaded["a"], tree["a"])
    np.testing.assert_array_equal(loaded["blocks"][1]["w"], 3.0)
    np.testing.assert_array_equal(loaded["nested"]["x"]["y"], 2.5)


def test_flatten_paths():
    flat = flatten_tree({"a": [{"b": np.zeros(1)}]})
    assert list(flat.keys()) == ["a/0/b"]
    tree = unflatten_tree(flat)
    assert isinstance(tree["a"], list)


def test_save_rejects_unroundtrippable_trees(tmp_path):
    """The flat .npz format cannot represent these; saving must fail loudly
    instead of corrupting the tree on load (all three previously silent)."""
    import pytest

    a = np.zeros((2,), np.float32)
    with pytest.raises(ValueError, match="all-digit"):
        save_pytree(tmp_path / "x.npz", {"layers": {"0": a, "1": a}})
    with pytest.raises(ValueError, match="separator"):
        save_pytree(tmp_path / "x.npz", {"a/b": a})
    with pytest.raises(ValueError, match="empty"):
        save_pytree(tmp_path / "x.npz", [{}, {"w": a}])


def test_save_uses_exact_path(tmp_path):
    """np.savez silently appends '.npz' to bare paths; save_pytree must
    write the EXACT path so a same-path load works."""
    p = tmp_path / "bundle.weights"
    save_pytree(p, {"w": np.arange(3, dtype=np.float32)})
    assert p.exists()
    loaded = load_pytree(p)
    np.testing.assert_array_equal(loaded["w"], np.arange(3, dtype=np.float32))
