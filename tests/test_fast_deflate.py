"""Differential gate for the fast deflate-9 clone (native/fast_deflate.cpp).

The clone must be byte-identical to zlib deflate(level=9, Z_FILTERED,
memLevel=9) — the exact encode configuration the reference uses
(rwpng.c: png_set_compression_* calls).  fd_test.cpp generates 211
adversarial cases per seed (stored/static/dynamic blocks, window slides,
MAX_DIST-straddling matches, run-heavy lossy-like data) and compares
against the system libz.  tools/fuzz_loop.py --deflate sweeps many seeds;
this gate runs one seed per test session.
"""

import os
import subprocess

import pytest

NATIVE = os.path.join(os.path.dirname(__file__), os.pardir, "native")


def _build(target: str) -> str:
    try:
        subprocess.run(["make", "-C", NATIVE, "-s", target],
                       check=True, capture_output=True)
    except (OSError, subprocess.CalledProcessError) as e:
        pytest.skip(f"cannot build {target}: {e}")
    return os.path.join(NATIVE, target)


@pytest.fixture(scope="module")
def fd_test():
    """Production ISA flags (-march=native): fuzzes the AVX-512 filter."""
    return _build("fd_test")


@pytest.fixture(scope="module")
def fd_test_portable():
    """No ISA flags: fuzzes the scalar-only walk the same sources fall
    back to on hosts without AVX-512."""
    return _build("fd_test_portable")


@pytest.mark.parametrize("seed", [0, 1])
def test_deflate_clone_matches_libz(fd_test, seed):
    r = subprocess.run([fd_test, str(seed)], capture_output=True, text=True)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "211/211" in r.stdout


def test_deflate_clone_matches_libz_portable(fd_test_portable):
    r = subprocess.run([fd_test_portable, "2"], capture_output=True,
                       text=True)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "211/211" in r.stdout
