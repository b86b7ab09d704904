"""Visualization: native ball-splat renderer and interactive viewer."""

from pointnet2_tpu.viz.viewer import render, showpoints  # noqa: F401
