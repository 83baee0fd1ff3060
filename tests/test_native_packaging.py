"""Native engine source discovery across install layouts (native.py).

The C++ host engine ships as package data (hnsw_tpu/native_src/, a
symlink to native/hnsw_native.cpp in the repo; a real file in a wheel —
pyproject.toml [tool.setuptools.package-data]).  ``_find_src`` must
resolve it in every layout and ``_so_path`` must fall back to a
writable cache when the source directory is not (site-packages).
"""
import os
import shutil

import pytest

from hnsw_tpu import native


def test_find_src_repo_layout():
    src = native._find_src()
    assert src is not None and os.path.exists(src)
    # repo layout wins: native/ next to the package
    assert os.path.sep + "native" + os.path.sep in src


def test_env_override_wins(tmp_path, monkeypatch):
    alt = tmp_path / "alt.cpp"
    shutil.copyfile(native._find_src(), alt)
    monkeypatch.setenv("HNSW_TPU_NATIVE_SRC", str(alt))
    assert native._find_src() == str(alt)


def test_installed_layout_package_data(tmp_path, monkeypatch):
    """Simulate a wheel install: no repo native/, only pkg/native_src."""
    pkg = tmp_path / "site" / "hnsw_tpu"
    (pkg / "native_src").mkdir(parents=True)
    real = os.path.realpath(native._find_src())
    shutil.copyfile(real, pkg / "native_src" / "hnsw_native.cpp")
    monkeypatch.delenv("HNSW_TPU_NATIVE_SRC", raising=False)
    monkeypatch.setattr(native, "__file__", str(pkg / "native.py"))
    src = native._find_src()
    assert src == str(pkg / "native_src" / "hnsw_native.cpp")


def test_so_path_unwritable_falls_back_to_cache(tmp_path, monkeypatch):
    src = tmp_path / "ro" / "hnsw_native.cpp"
    src.parent.mkdir()
    src.write_text("// stub")
    # root can write anywhere; patch the access check instead of chmod
    monkeypatch.setattr(native.os, "access", lambda p, m: False)
    so = native._so_path(str(src))
    assert os.path.expanduser("~") in so and ".cache" in so


def test_packaged_source_is_current():
    """The symlinked package copy must track the repo source byte-for-
    byte (a stale copy would ship an old engine in the wheel)."""
    pkg = os.path.dirname(os.path.abspath(native.__file__))
    packaged = os.path.join(pkg, "native_src", "hnsw_native.cpp")
    repo = os.path.join(os.path.dirname(pkg), "native", "hnsw_native.cpp")
    if not (os.path.exists(packaged) and os.path.exists(repo)):
        pytest.skip("not the repo layout")
    with open(packaged, "rb") as a, open(repo, "rb") as b:
        assert a.read() == b.read()
