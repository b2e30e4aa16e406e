from pysteps_tpu.parallel.mesh import (  # noqa: F401
    ens_sharding,
    make_mesh,
    replicated,
    shard_ensemble,
)
