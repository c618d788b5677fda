"""Test configuration.

Unit tests run JAX on a virtual 8-device CPU mesh so sharding logic is
exercised without TPU hardware. Set PNGLOSS_TEST_TPU=1 to run on real devices.
"""

import os
import shutil
import subprocess
import sys

if not os.environ.get("PNGLOSS_TEST_TPU"):
    # The image's sitecustomize force-registers the 'axon' TPU-tunnel platform
    # and overrides JAX_PLATFORMS from the environment, so the env var alone is
    # not enough — select the CPU backend through jax.config after import.
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    import jax

    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402

REFERENCE_SRC = "/root/reference/src"
ORACLE_BIN = "/tmp/pngloss_oracle/pngloss"
SUITE_DIR = "/root/reference/suite"


def _build_oracle() -> str | None:
    """Compile the reference C tool (out of tree, never copied into the repo)
    to serve as the byte-level parity oracle."""
    if os.path.exists(ORACLE_BIN):
        return ORACLE_BIN
    if not os.path.isdir(REFERENCE_SRC) or not shutil.which("gcc"):
        return None
    os.makedirs(os.path.dirname(ORACLE_BIN), exist_ok=True)
    srcs = [
        os.path.join(REFERENCE_SRC, f)
        for f in os.listdir(REFERENCE_SRC)
        if f.endswith(".c")
    ]
    try:
        subprocess.run(
            ["gcc", "-O2", "-o", ORACLE_BIN, *srcs, "-lpng", "-lz", "-lm"],
            check=True, capture_output=True, timeout=120,
        )
    except (subprocess.CalledProcessError, subprocess.TimeoutExpired):
        return None
    return ORACLE_BIN


@pytest.fixture(scope="session")
def oracle():
    """Path to the compiled reference pngloss binary, or skip."""
    path = _build_oracle()
    if path is None:
        pytest.skip("reference oracle unavailable")
    return path


@pytest.fixture(scope="session")
def suite_dir():
    if not os.path.isdir(SUITE_DIR):
        pytest.skip("reference suite images unavailable")
    return SUITE_DIR


def run_oracle(oracle_bin, png_bytes: bytes, strength: int, bleed: int = 2,
               strip: bool = False, tmp_path=None, extra_args=()) -> bytes:
    """Run the C tool on png_bytes via stdin/stdout and return output bytes."""
    args = [oracle_bin, "-f", "-s", str(strength), "-b", str(bleed)]
    if strip:
        args.append("--strip")
    args += list(extra_args)
    args.append("-")
    proc = subprocess.run(args, input=png_bytes, capture_output=True, timeout=600)
    assert proc.returncode == 0, proc.stderr.decode(errors="replace")
    return proc.stdout
