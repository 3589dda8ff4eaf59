"""Test harness configuration.

Tests run on CPU with a virtual 8-device mesh
(``--xla_force_host_platform_device_count=8``) so sharding/pjit paths are
exercised without TPU hardware.  This must happen before the first
``import jax`` anywhere in the test process.
"""

import os
import sys

# NOTE for this environment: a remote-TPU (axon) PJRT client may be
# registered in every python process at interpreter start (sitecustomize).
# Tests force the CPU backend below; run test processes SERIALLY — two
# concurrent JAX processes contend on the single TPU tunnel and wedge.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("OMP_NUM_THREADS", "1")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# the sitecustomize hook may have programmatically forced the axon
# platform; the env var alone no longer wins, so override the config too
jax.config.update("jax_platforms", "cpu")

import faulthandler  # noqa: E402
import signal  # noqa: E402

# `kill -USR1 <pid>` dumps all thread stacks — debugging aid for hangs
faulthandler.register(signal.SIGUSR1, all_threads=True)

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_DIR = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_DIR)


@pytest.fixture()
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def tiny_charset():
    """A small charset: specials + 'a'..'j' + space."""
    from rcnn_ocr_tpu.vocab.charset import Charset

    return Charset.from_tokens(["<PAD>", "<SOS>", "<EOS>", " "] + list("abcdefghij"))
