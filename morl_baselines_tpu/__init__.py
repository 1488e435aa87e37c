"""morl_baselines_tpu — TPU-native multi-objective RL framework.

A from-scratch JAX/XLA re-design of the capability surface of
LucasAlegre/morl-baselines: device-resident vectorized MO environments,
functional replay buffers, weight-conditioned networks, jitted batched update
steps for the full algorithm suite, and batched Pareto/hypervolume evaluation,
sharded over TPU meshes via ``jax.sharding``.
"""

__version__ = "0.1.0"
