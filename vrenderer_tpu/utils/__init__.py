from vrenderer_tpu.utils import math3d

__all__ = ["math3d"]
