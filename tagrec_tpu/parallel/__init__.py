from tagrec_tpu.parallel.mesh import make_mesh
from tagrec_tpu.parallel import sharding

__all__ = ["make_mesh", "sharding"]
