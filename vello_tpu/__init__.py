"""vello_tpu — a TPU-native 2D vector graphics renderer.

A from-scratch rebuild of the capabilities of linebender/vello as a
JAX/XLA/Pallas pipeline: Scene/Encoding API, CPU oracle renderer, and a
sort/scan-based device pipeline (no atomics, no indirect dispatch).
"""

from . import kurbo, peniko
from .kurbo import Affine, BezPath, Rect, Stroke
from .peniko import BlendMode, Color, Compose, Extend, Fill, Gradient, \
    Image, Mix, palette
from .scene import Scene
from .encoding.config import RenderParams

__version__ = "0.1.0"
