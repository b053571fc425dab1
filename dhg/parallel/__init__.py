from dhg.parallel.mesh import make_mesh, batch_sharding, replicated  # noqa: F401
from dhg.parallel.sharding import param_shardings  # noqa: F401
