from vrenderer_tpu.parallel import sharded

__all__ = ["sharded"]
