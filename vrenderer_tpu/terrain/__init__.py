from vrenderer_tpu.terrain import grid, heightmap, quadtree

__all__ = ["grid", "heightmap", "quadtree"]
