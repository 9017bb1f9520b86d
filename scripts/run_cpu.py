"""Run a script on the CPU backend on machines whose sitecustomize
pre-imports jax (shell-level JAX_PLATFORMS=cpu is too late there — the env
var is captured at import; jax.config.update still works until a backend
initializes, same trick as tests/conftest.py).

Usage: python scripts/run_cpu.py <script.py> [args...]
Sets GITPU_PALLAS_INTERPRET=1 so Pallas kernels run in interpret mode.
"""

import os
import runpy
import sys

os.environ.setdefault("GITPU_PALLAS_INTERPRET", "1")
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", jax.default_backend()

script = sys.argv[1]
sys.argv = sys.argv[1:]
sys.path.insert(0, os.getcwd())
runpy.run_path(script, run_name="__main__")
