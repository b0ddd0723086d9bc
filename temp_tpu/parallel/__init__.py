from temp_tpu.parallel.mesh import (  # noqa: F401
    active_mesh, constrain, make_mesh, use_mesh,
)
