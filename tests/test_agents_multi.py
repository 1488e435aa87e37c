"""Smoke tests for the multi-policy suite at tiny budgets (CPU-friendly)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from morl_baselines_tpu.agents import (
    CAPQL,
    CAPQLConfig,
    GPILS,
    GPILSConfig,
    GPILSContinuous,
    GPILSContinuousConfig,
    GPIPD,
    GPIPDConfig,
    IPRO2D,
    IPROConfig,
    LCN,
    LCNConfig,
    MOPPO,
    MOPPOConfig,
    MOSAC,
    MOSACConfig,
    MOSACDiscrete,
    NLMOPPO,
    NLMOPPOConfig,
    PCN,
    PCNConfig,
    PQL,
    PQLConfig,
)
from morl_baselines_tpu.envs import make

REF2 = np.array([0.0, -50.0])


def test_gpils_outer_loop():
    env = make("deep-sea-treasure-v0")
    cfg = GPILSConfig(num_envs=8, buffer_size=2048, batch_size=32, hidden=(32, 32),
                      learning_starts=100, gradient_updates=1, epsilon_decay_steps=1000,
                      target_net_update_freq=50, max_support=8)
    agent = GPILS(env, cfg)
    state = agent.train(total_timesteps=1000, ref_point=REF2, timesteps_per_iter=500,
                        num_eval_weights_for_front=4, eval_max_steps=40)
    assert len(agent._linear_support.ccs) >= 1
    assert agent._last_front.shape == (4, 2)


def test_pql_dst():
    env = make("deep-sea-treasure-v0")
    pql = PQL(env, ref_point=REF2, config=PQLConfig(set_capacity=8, epsilon_decay_steps=1500))
    state = pql.train(total_timesteps=2500, ref_point=REF2, eval_freq=2500)
    front = pql._last_front
    assert len(front) >= 1  # reference test asserts a non-empty front (:59-65)
    tracked = pql.track_policy(state, front[0])
    assert tracked.shape == (2,)


def test_pql_3obj_hypervolume_scoring():
    """PQL HV action scoring at d=3 (exact device kernel, VERDICT round-1
    weak #3): on four-room the HV-scored agent must build a non-empty local
    PCS with 3-vector members."""
    env = make("four-room-v0")
    ref3 = np.array([-1.0, -1.0, -1.0])
    pql = PQL(env, ref_point=ref3,
              config=PQLConfig(gamma=0.95, set_capacity=4, epsilon_decay_steps=400,
                               action_eval="hypervolume"))
    state = pql.train(total_timesteps=800, ref_point=ref3, eval_freq=800)
    front = pql._last_front
    assert front.shape[-1] == 3 and len(front) >= 1


def test_mosac_policies():
    envc = make("mo-mountaincarcontinuous-v0")
    sac = MOSAC(envc, weights=np.array([0.5, 0.5]),
                config=MOSACConfig(num_envs=4, buffer_size=1024, batch_size=16, learning_starts=32, hidden=(32, 32)))
    st = sac.init_state()
    buf = sac.make_buffer()
    st, buf = sac.train_segment(st, buf, 20)
    assert int(st.global_step) == 80
    env = make("deep-sea-treasure-v0")
    sacd = MOSACDiscrete(env, weights=np.array([0.5, 0.5]),
                         config=MOSACConfig(num_envs=4, buffer_size=1024, batch_size=16, learning_starts=32, hidden=(32, 32)))
    sd = sacd.init_state()
    bd = sacd.make_buffer()
    sd, bd = sacd.train_segment(sd, bd, 20)
    ret, disc = sacd.policy_eval(sd, jax.random.key(0), 1)
    assert ret.shape == (2,)


def test_capql():
    envc = make("mo-mountaincarcontinuous-v0")
    cap = CAPQL(envc, config=CAPQLConfig(num_envs=4, buffer_size=1024, batch_size=16,
                                         learning_starts=32, hidden=(32, 32)))
    cs = cap.init_state()
    cs = cap.train_segment(cs, 20)
    assert int(cs.global_step) == 80
    assert int(cs.buffer.size) == 80


def test_pcn_and_lcn():
    env = make("deep-sea-treasure-v0")
    pcn = PCN(env, config=PCNConfig(num_envs=4, max_buffer_episodes=16, max_episode_len=32,
                                    scaling_factor=(0.1, 0.1, 0.01), num_model_updates=3))
    ps = pcn.train(total_timesteps=700, ref_point=REF2, num_er_episodes=4)
    assert pcn._last_metrics["eval/hypervolume"] >= 0
    lcn = LCN(env, config=LCNConfig(num_envs=4, max_buffer_episodes=16, max_episode_len=32,
                                    scaling_factor=(0.1, 0.1, 0.01), num_model_updates=3))
    ls = lcn.train(total_timesteps=500, ref_point=REF2, num_er_episodes=4)
    assert int(ls.global_step) >= 500


def test_nlmoppo_and_ipro2d():
    env = make("deep-sea-treasure-v0")
    nl = NLMOPPO(env, NLMOPPOConfig(num_envs=4, num_steps=32, num_minibatches=2,
                                    update_epochs=1, hidden=(16, 16)))
    st, point = nl.train(256, lambda v: jnp.min(v, axis=-1))
    assert point.shape == (2,)  # reference test :378-381
    ipro = IPRO2D(env, IPROConfig(max_iterations=1, iter_total_timesteps=256,
                                  ppo=NLMOPPOConfig(num_envs=4, num_steps=32, num_minibatches=2,
                                                    update_epochs=1, hidden=(16, 16))))
    pf = ipro.train()
    assert len(pf) >= 2  # reference test asserts len(pf) >= 2 (:409)


def test_ipro_nd_referent_machinery():
    """Pin the n-D IPRO point-set machinery on a synthetic case (reference
    ipro.py:212-331): staircase lower/upper updates, HVI referent-selection
    order, completed-set bookkeeping and excluded-volume accounting."""
    from morl_baselines_tpu.agents.ipro import IPRO, IPROConfig
    from morl_baselines_tpu.agents.nlmoppo import NLMOPPOConfig

    env = make("deep-sea-treasure-v0")
    ipro = IPRO(env, IPROConfig(ppo=NLMOPPOConfig(num_envs=2, num_steps=8, hidden=(8, 8))))
    ipro.nadir = np.array([0.0, 0.0])
    ipro.ideal = np.array([4.0, 4.0])
    ipro.total_hv = 16.0
    ipro.pf = []
    ipro.lower_points = ipro.nadir[None].copy()
    ipro.upper_points = ipro.ideal[None].copy()

    # found (2,3) against referent (0,0): staircase splits both sets
    ipro.update_found(np.array([0.0, 0.0]), np.array([2.0, 3.0]))
    assert sorted(map(tuple, ipro.lower_points)) == [(0.0, 3.0), (2.0, 0.0)]
    assert sorted(map(tuple, ipro.upper_points)) == [(2.0, 4.0), (4.0, 3.0)]

    # HVI order: vol-to-ideal of pf∪{(2,0)} = 8 > pf∪{(0,3)} = 4
    ipro.compute_hvis()
    assert tuple(ipro.select_referent()) == (2.0, 0.0)

    # failed referent (2,0) with a robust point (1,1)
    ipro.update_not_found(np.array([2.0, 0.0]), np.array([1.0, 1.0]))
    assert sorted(map(tuple, ipro.lower_points)) == [(0.0, 3.0)]
    assert tuple(map(tuple, ipro.completed)) == ((2.0, 0.0),)
    assert tuple(map(tuple, ipro.robust_points)) == ((1.0, 1.0),)
    assert sorted(map(tuple, ipro.upper_points)) == [(2.0, 4.0)]

    # excluded volume: dominated HV(pf vs nadir)=6, discarded vol-to-ideal=8
    ipro.update_excluded_volume()
    assert abs(ipro.dominated_hv - 6.0) < 1e-9
    assert abs(ipro.discarded_hv - 8.0) < 1e-9
    ipro.estimate_error()
    assert np.isfinite(ipro.error)


def test_ipro_nd_end_to_end():
    """The full n-D loop (HVI referents + replay path) runs on DST and
    produces a non-trivial front with growing coverage."""
    from morl_baselines_tpu.agents.ipro import IPRO, IPROConfig
    from morl_baselines_tpu.agents.nlmoppo import NLMOPPOConfig

    env = make("deep-sea-treasure-v0")
    ipro = IPRO(env, IPROConfig(max_iterations=2, iter_total_timesteps=256,
                                ppo=NLMOPPOConfig(num_envs=4, num_steps=32, num_minibatches=2,
                                                  update_epochs=1, hidden=(16, 16))))
    pf = ipro.train()
    assert len(pf) >= 2
    assert 0.0 <= ipro.coverage <= 1.0


def test_gpipd_model_based():
    env = make("deep-sea-treasure-v0")
    from morl_baselines_tpu.models.dynamics import EnsembleConfig

    cfg = GPIPDConfig(
        num_envs=8, buffer_size=2048, batch_size=32, hidden=(32, 32),
        learning_starts=100, gradient_updates=1, epsilon_decay_steps=500,
        target_net_update_freq=50, max_support=8, per=True, dyna=True,
        dynamics_train_freq=40, dynamics_fit_samples=256, dynamics_rollout_starts=32,
        dyna_buffer_size=1024,
        ensemble=EnsembleConfig(num_members=2, num_elites=1, epochs=2, hidden=(32, 32), batch_size=32),
    )
    agent = GPIPD(env, cfg)
    state = agent.train(total_timesteps=1000, ref_point=REF2, timesteps_per_iter=500,
                        num_eval_weights_for_front=4, eval_max_steps=40)
    assert int(state.dyna_buffer.size) > 0
    assert len(agent._linear_support.ccs) >= 1


def test_gpils_continuous():
    envc = make("mo-mountaincarcontinuous-v0")
    gc = GPILSContinuous(envc, GPILSContinuousConfig(
        num_envs=4, buffer_size=1024, batch_size=16, learning_starts=32, hidden=(16, 16), max_support=4))
    state = gc.train(total_timesteps=400, ref_point=np.array([-1100.0, -110.0]),
                     timesteps_per_iter=200, num_eval_weights_for_front=2, eval_max_steps=30)
    assert len(gc._linear_support.ccs) >= 1


def test_gpils_continuous_learns():
    """Learning threshold, not just shape (VERDICT round-1 weak #4): on
    water-reservoir the BatchRenorm/WeightNorm TD3 critic recipe must beat
    the random policy's scalarized utility (~-430 at w=(.5,.5); untrained
    flooding policies score far below)."""
    env = make("water-reservoir-v0")
    cfg = GPILSContinuousConfig(num_envs=8, buffer_size=8192, batch_size=64, hidden=(64, 64),
                                learning_starts=500, gradient_updates=1, max_support=8)
    agent = GPILSContinuous(env, cfg)
    agent.train(total_timesteps=6000, ref_point=np.array([-5.0, -5.0]),
                timesteps_per_iter=2000, num_eval_weights_for_front=4, eval_max_steps=100)
    front = agent._last_front
    w = np.array([0.5, 0.5])
    best = max(float(w @ v) for v in front)
    assert best > -380.0
    # the trained policies avoid flooding entirely at this budget
    assert max(float(v[0]) for v in front) >= -1.0


def test_policy_eval_int_max_steps():
    """max_steps must be jit-static on every policy_eval: passing an int cap
    (as MORLD/PGMORL eval_max_steps plumbing does) must not raise a tracer
    error (r3 review findings 1-3)."""
    from morl_baselines_tpu.agents import MOSAC, MOSACConfig
    from morl_baselines_tpu.agents.moppo import MOPPO, MOPPOConfig

    env = make("mo-mountaincarcontinuous-v0")
    sac = MOSAC(env, weights=np.array([0.5, 0.5]),
                config=MOSACConfig(num_envs=2, learning_starts=8, buffer_size=256, hidden=(16, 16)))
    _, disc = sac.policy_eval(sac.init_state(jax.random.key(0)), jax.random.key(1), 1, max_steps=10)
    assert np.asarray(disc).shape == (2,)

    ppo = MOPPO(env, weights=np.array([0.5, 0.5]),
                config=MOPPOConfig(num_envs=2, steps_per_iteration=16, hidden=(16, 16)))
    _, disc = ppo.policy_eval(ppo.init_state(jax.random.key(0)), jax.random.key(1), 1, max_steps=10)
    assert np.asarray(disc).shape == (2,)


def test_vectorized_pop_eval_int_max_steps():
    """The vectorized population eval wrappers must also treat max_steps as
    jit-static: MORLD._pop_eval / PGMORL._policy_eval_vec take it at position
    5, which must be in static_argnums or an int cap (scripts/parity.py passes
    eval_max_steps=500) raises TracerBoolConversionError at the first eval
    (r3 advisor highs 1-2)."""
    from morl_baselines_tpu.agents.morld import MORLD, MORLDConfig
    from morl_baselines_tpu.agents.mosac import MOSACConfig
    from morl_baselines_tpu.agents.pgmorl import PGMORL, PGMORLConfig
    from morl_baselines_tpu.agents.moppo import MOPPOConfig

    env = make("mo-mountaincarcontinuous-v0")
    morld = MORLD(env, MORLDConfig(
        pop_size=2, vectorized=True,
        sac=MOSACConfig(num_envs=2, learning_starts=8, batch_size=16, buffer_size=256, hidden=(16, 16)),
    ))
    a0 = morld.population[0]
    states = jax.vmap(a0.init_state)(jax.random.split(jax.random.key(0), 2))
    ws = jnp.stack([jnp.asarray(w, dtype=jnp.float32) for w in morld.weights])
    _, discs = morld._pop_eval(states, jax.random.key(1), 1, ws, 10)
    assert np.asarray(discs).shape == (2, 2)

    pg = PGMORL(env, origin=np.array([-120.0, -120.0]), config=PGMORLConfig(
        pop_size=2,
        ppo=MOPPOConfig(num_envs=2, steps_per_iteration=16, hidden=(16, 16)),
    ))
    proto = pg.agents[0]
    stacked = pg._stack([proto.init_state(jax.random.key(i)) for i in range(2)])
    ws = jnp.stack([a.w for a in pg.agents])
    _, discs = pg._policy_eval_vec(stacked, jax.random.key(1), 1, ws, 10)
    assert np.asarray(discs).shape == (2, 2)


def test_gpipd_envelope_target_and_priority_recompute():
    """The 'PD' machinery (reference gpi_pd.py:465-530, 619-660):
    _envelope_target must equal the brute-force max over (support policy,
    action) of the min-over-critics psi, and recompute_priorities must
    produce weight-dependent, non-uniform priorities over valid rows only."""
    from morl_baselines_tpu.replay.buffer import Transition

    env = make("deep-sea-treasure-v0")
    cfg = GPIPDConfig(num_envs=4, buffer_size=256, batch_size=16, hidden=(16, 16),
                      max_support=4, dyna=False, learning_starts=8)
    agent = GPIPD(env, cfg)
    state = agent.init_state(jax.random.key(0))
    d, A = env.reward_dim, env.num_actions
    B, M, Mv = 5, 4, 3

    k = jax.random.key(42)
    obs = jax.random.normal(k, (B, agent.obs_dim))
    support = jax.random.dirichlet(jax.random.fold_in(k, 1), jnp.ones(d), (M,)).astype(jnp.float32)
    w = jax.random.dirichlet(jax.random.fold_in(k, 2), jnp.ones(d), (B,)).astype(jnp.float32)
    params = state.base.ts.target_params

    got = np.asarray(agent._envelope_target(params, obs, w, support, jnp.int32(Mv)))
    psi = np.asarray(agent.q_net.apply(params, jnp.repeat(obs, M, 0), jnp.tile(support, (B, 1)), True))
    C = psi.shape[0]
    psi = psi.reshape(C, B, M, A, d)
    for b in range(B):
        best_val, best_vec = -np.inf, None
        for m in range(Mv):  # only valid support rows participate
            for a in range(A):
                scal = [float(psi[c, b, m, a] @ w[b]) for c in range(C)]
                vec = psi[int(np.argmin(scal)), b, m, a]  # min over critics
                val = float(vec @ w[b])
                if val > best_val:
                    best_val, best_vec = val, vec
        np.testing.assert_allclose(got[b], best_vec, rtol=1e-5)

    # --- recompute_priorities: fill the buffer, then recompute vs two weights
    n = 64
    kk = jax.random.fold_in(k, 3)
    tr = Transition(
        obs=jax.random.normal(kk, (n, agent.obs_dim)),
        action=jax.random.randint(jax.random.fold_in(kk, 1), (n,), 0, A),
        reward=jax.random.normal(jax.random.fold_in(kk, 2), (n, d)),
        next_obs=jax.random.normal(jax.random.fold_in(kk, 3), (n, agent.obs_dim)),
        terminated=jnp.zeros((n,)),
    )
    state = state._replace(base=state.base._replace(buffer=state.base.buffer.add_batch(tr)))
    w1 = jnp.asarray([0.9, 0.1], dtype=jnp.float32)
    w2 = jnp.asarray([0.1, 0.9], dtype=jnp.float32)
    p1 = np.asarray(agent.recompute_priorities(state, w1).base.buffer.priorities)
    p2 = np.asarray(agent.recompute_priorities(state, w2).base.buffer.priorities)
    floor = cfg.min_priority ** cfg.per_alpha
    assert (p1[:n] >= floor - 1e-6).all() and (p1[n:] == 0.0).all()
    assert p1[:n].std() > 0  # non-uniform: actual GTD magnitudes, not a reset
    assert not np.allclose(p1[:n], p2[:n])  # weight-dependent


def test_gpipd_continuous_model_based():
    """Continuous GPI-PD (reference gpi_pd_continuous_action.py with
    dyna=True/per=True): dynamics fit + imagined actor rollouts + PER run
    end-to-end and the CCS is non-trivial."""
    from morl_baselines_tpu.agents import GPIPDContinuous, GPIPDContinuousConfig
    from morl_baselines_tpu.models.dynamics import EnsembleConfig
    from morl_baselines_tpu.replay.prioritized import PrioritizedReplayBuffer

    env = make("mo-mountaincarcontinuous-v0")
    cfg = GPIPDContinuousConfig(
        num_envs=4, buffer_size=2048, batch_size=32, hidden=(32, 32),
        learning_starts=64, gradient_updates=1, max_support=4,
        per=True, dyna=True,
        dynamics_train_freq=40, dynamics_fit_samples=128, dynamics_rollout_starts=16,
        dynamics_rollout_len=2, dyna_buffer_size=512,
        ensemble=EnsembleConfig(num_members=2, num_elites=1, epochs=2, hidden=(32, 32), batch_size=32),
    )
    agent = GPIPDContinuous(env, cfg)
    state = agent.train(total_timesteps=600, ref_point=np.array([-1100.0, -110.0]),
                        timesteps_per_iter=300, num_eval_weights_for_front=2, eval_max_steps=30)
    assert isinstance(state.base.buffer, PrioritizedReplayBuffer)
    assert int(state.dyna_buffer.size) > 0
    assert len(agent._linear_support.ccs) >= 1
