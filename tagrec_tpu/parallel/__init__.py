from tagrec_tpu.parallel.mesh import make_mesh
from tagrec_tpu.parallel import launch, sharding, topk

__all__ = ["make_mesh", "launch", "sharding", "topk"]
