"""Model-asset manifest tests (tools/fetch_models.py) — hermetic.

The network fetch itself needs egress; these tests pin down everything
else: manifest consistency with the runtime registry, converter
resolvability, and the source-integrity verification logic (full pin,
prefix pin, trust-on-first-use)."""

import hashlib
import importlib
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
import fetch_models  # noqa: E402

from dlimgedit_tpu.runtime.environment import SAM_BUNDLES  # noqa: E402


def test_manifest_covers_runtime_bundles():
    bundles = {s.bundle for s in fetch_models.MANIFEST.values()}
    # Every SAM bundle the runtime knows how to load has a manifest entry.
    for fname in SAM_BUNDLES.values():
        assert fname in bundles, fname
    # BiRefNet covered too.
    assert any(b.startswith("birefnet") for b in bundles)


def test_manifest_converters_resolve():
    for spec in fetch_models.MANIFEST.values():
        mod_name, fn_name = spec.converter.rsplit(".", 1)
        mod = importlib.import_module(f"dlimgedit_tpu.convert.{mod_name}")
        assert callable(getattr(mod, fn_name))
        assert spec.url.startswith("https://")


def _write(tmp_path, data: bytes) -> Path:
    p = tmp_path / "ckpt.bin"
    p.write_bytes(data)
    return p


def test_verify_full_pin(tmp_path):
    p = _write(tmp_path, b"hello")
    good = hashlib.sha256(b"hello").hexdigest()
    spec = fetch_models.ModelSpec("x", "https://x", "x.npz", "c", sha256=good)
    pin = tmp_path / "ckpt.bin.sha256"
    assert fetch_models.verify_source(spec, p, pin) == good
    bad = fetch_models.ModelSpec("x", "https://x", "x.npz", "c", sha256="0" * 64)
    with pytest.raises(ValueError, match="sha256"):
        fetch_models.verify_source(bad, p, pin)


def test_verify_prefix_pin(tmp_path):
    p = _write(tmp_path, b"hello")
    good = hashlib.sha256(b"hello").hexdigest()
    pin = tmp_path / "ckpt.bin.sha256"
    ok = fetch_models.ModelSpec("x", "https://x", "x.npz", "c",
                                sha256_prefix=good[:6])
    fetch_models.verify_source(ok, p, pin)
    bad = fetch_models.ModelSpec("x", "https://x", "x.npz", "c",
                                 sha256_prefix="ffffff")
    with pytest.raises(ValueError, match="prefix"):
        fetch_models.verify_source(bad, p, pin)


def test_verify_trust_on_first_use(tmp_path):
    spec = fetch_models.ModelSpec("x", "https://x", "x.npz", "c")
    p = _write(tmp_path, b"first")
    pin = tmp_path / "ckpt.bin.sha256"
    d1 = fetch_models.verify_source(spec, p, pin)
    assert pin.read_text().split()[0] == d1
    # Same content verifies again; changed content is rejected.
    fetch_models.verify_source(spec, p, pin)
    p.write_bytes(b"second")
    with pytest.raises(ValueError, match="changed since first fetch"):
        fetch_models.verify_source(spec, p, pin)


def test_cli_list(capsys):
    assert fetch_models.main(["--list"]) == 0
    out = capsys.readouterr().out
    assert "mobile_sam" in out and "birefnet" in out


def test_verify_md5_prefix_pin(tmp_path):
    """SAM filenames embed MD5 (not sha256) prefixes; verify that kind."""
    p = _write(tmp_path, b"hello")
    good_md5 = hashlib.md5(b"hello").hexdigest()
    pin = tmp_path / "ckpt.bin.sha256"
    ok = fetch_models.ModelSpec("x", "https://x", "x.npz", "c",
                                md5_prefix=good_md5[:6])
    fetch_models.verify_source(ok, p, pin)
    bad = fetch_models.ModelSpec("x", "https://x", "x.npz", "c",
                                 md5_prefix="ffffff")
    with pytest.raises(ValueError, match="md5"):
        fetch_models.verify_source(bad, p, pin)


def test_sam_manifest_entries_use_md5_prefixes():
    for key in ("vit_b", "vit_l", "vit_h"):
        spec = fetch_models.MANIFEST[key]
        frag = spec.url.rsplit("_", 1)[1].split(".")[0]
        assert spec.md5_prefix == frag  # filename fragment == pinned prefix
        assert spec.sha256_prefix is None
