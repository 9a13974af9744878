from vrenderer_tpu.models import mesh, scene

__all__ = ["mesh", "scene"]
