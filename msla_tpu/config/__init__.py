"""Native Hydra-equivalent configuration subsystem.

Provides the composition / interpolation / instantiation surface the reference
builds on Hydra + OmegaConf (reference: configs/**, src/main.py:214), so the
config tree, group layout, and flag names map 1:1 while remaining pure Python.
"""
from msla_tpu.config.compose import ComposeError, compose
from msla_tpu.config.instantiate import InstantiationError, get_class, instantiate
from msla_tpu.config.node import ConfigNode, InterpolationError
from msla_tpu.config.runtime import setup_job_logging, setup_root, setup_run_dir

__all__ = [
    "ComposeError",
    "ConfigNode",
    "InstantiationError",
    "InterpolationError",
    "compose",
    "get_class",
    "instantiate",
    "setup_job_logging",
    "setup_root",
    "setup_run_dir",
]
