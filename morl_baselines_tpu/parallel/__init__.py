from .mesh import batch_sharded, make_mesh, replicated, shard_agent_state

__all__ = ["batch_sharded", "make_mesh", "replicated", "shard_agent_state"]
