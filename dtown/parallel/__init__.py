"""Multi-chip / multi-host scaling (introduced by the rebuild; SURVEY §5.8)."""
from dtown.parallel.mesh import ENVS_AXIS, make_mesh, env_sharding, replicated  # noqa: F401
from dtown.parallel.shard import make_sharded_env, make_sharded_ppo  # noqa: F401
