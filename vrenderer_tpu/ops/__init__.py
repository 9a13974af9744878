from vrenderer_tpu.ops import texture

__all__ = ["texture"]
