"""Test harness setup.

Runs every test on a virtual 8-device CPU mesh so multi-chip sharding paths
compile and execute without TPU hardware (SURVEY.md §4: replaces the
reference's absent multi-node tests).
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("PROJECT_ROOT", os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The axon sitecustomize force-selects the TPU platform via jax.config at
# interpreter start; env vars alone don't win. Reset to CPU before any
# backend initialization so tests run on the virtual 8-device CPU mesh.
import jax

jax.config.update("jax_platforms", "cpu")

# Persistent compile cache, scoped to this machine's CPU fingerprint (foreign
# XLA:CPU AOT entries can SIGILL — see machine_scoped_cpu_cache_dir). The
# suite jits hundreds of train/eval graphs; warm runs skip those compiles.
from msla_tpu.utils.util import machine_scoped_cpu_cache_dir

jax.config.update("jax_compilation_cache_dir", machine_scoped_cpu_cache_dir())
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


def make_sine_track(rng: np.random.Generator, sr: int, seconds: float, n_stems: int = 4,
                    silent_stems: tuple = ()) -> np.ndarray:
    """Synthetic 4-stem 'song': distinct sine mixes per stem (test fixture)."""
    t = np.arange(int(sr * seconds)) / sr
    stems = []
    for i in range(n_stems):
        if i in silent_stems:
            stems.append(np.zeros_like(t, dtype=np.float32))
            continue
        f0 = 55.0 * (2 ** i) * (1 + 0.01 * rng.standard_normal())
        wave = 0.4 * np.sin(2 * np.pi * f0 * t) + 0.1 * np.sin(2 * np.pi * 2 * f0 * t + 0.5)
        wave += 0.01 * rng.standard_normal(t.shape)
        stems.append(wave.astype(np.float32))
    return np.stack(stems)
