"""PCN — Pareto Conditioned Networks, vectorized on device.

TPU-native re-design of reference multi_policy/pcn/pcn.py:22-539 (Reymond et
al., 2022): supervised learning of pi(a | s, desired_return, desired_horizon).

Kept semantics:
- Model: sigmoid state-embedding x sigmoid command-embedding product, command
  scaled by a fixed per-env ``scaling_factor`` (reference :51-103).
- Episodic ER ranked by distance-to-front with crowding penalty (our
  EpisodicBuffer reproduces the heap key; reference :240-279).
- Command selection: pick a random non-dominated episode; desired_horizon =
  its length - 2; desired_return = its return with uniform noise added on one
  random objective, scaled by the across-episode std (reference :281-300).
- In-episode command update: r <- (r - reward)/gamma, h <- max(h-1, 1).
- CE loss on discrete actions / MSE on continuous (reference :202-236).

Re-design: N envs collect episodes in parallel under a masked scan (each env
holds its own command); training is jitted batch CE over sampled steps.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core.pareto import non_dominated_mask
from ..envs.base import Box, MOEnv
from ..evaluation.evaluation import multi_policy_metrics
from ..models.networks import TrainState
from ..replay.episodic import EpisodeBatch, EpisodicBuffer
from .base import MOAgentBase


class PCNModel(nn.Module):
    """pi(a | s, command) via state-emb * command-emb (reference pcn.py:51-103)."""

    action_dim: int
    scaling_factor: tuple  # (d+1,) fixed command scaling
    hidden_dim: int = 64
    continuous: bool = False

    @nn.compact
    def __call__(self, obs, desired_return, desired_horizon):
        c = jnp.concatenate([desired_return, desired_horizon[..., None]], axis=-1)
        c = c * jnp.asarray(self.scaling_factor)
        s = nn.sigmoid(nn.Dense(self.hidden_dim)(obs))
        c = nn.sigmoid(nn.Dense(self.hidden_dim)(c))
        h = nn.relu(nn.Dense(self.hidden_dim)(s * c))
        out = nn.Dense(self.action_dim)(h)
        return out  # logits (discrete) or raw actions (continuous)


@dataclass(frozen=True)
class PCNConfig:
    learning_rate: float = 1e-3
    gamma: float = 1.0
    batch_size: int = 256
    hidden_dim: int = 64
    scaling_factor: tuple = (0.1, 0.1, 0.01)  # (d treasure dims..., horizon)
    max_buffer_episodes: int = 128
    max_episode_len: int = 128
    num_envs: int = 8  # episodes collected in parallel per round
    num_model_updates: int = 50
    noise_std_scale: float = 1.0
    seed: int = 0


class PCNState(NamedTuple):
    ts: TrainState
    buffer: EpisodicBuffer
    key: jax.Array
    global_step: jnp.ndarray
    desired_return: jnp.ndarray  # (d,) current command
    desired_horizon: jnp.ndarray  # ()


class PCN(MOAgentBase):
    def __init__(self, env: MOEnv, config: PCNConfig = PCNConfig(), log: bool = False):
        super().__init__(env, config, log=log)
        self.cfg = config
        self.continuous = isinstance(env.action_space, Box)
        self.action_dim = env.action_dim if self.continuous else env.num_actions
        assert len(config.scaling_factor) == env.reward_dim + 1
        self._buffer_rank_lambda = None  # LCN sets this to rank by Lorenz dominance
        self.model = PCNModel(
            action_dim=self.action_dim,
            scaling_factor=tuple(config.scaling_factor),
            hidden_dim=config.hidden_dim,
            continuous=self.continuous,
        )

    def init_state(self, key: jax.Array | None = None) -> PCNState:
        cfg = self.cfg
        key = key if key is not None else jax.random.key(cfg.seed)
        kp, key = jax.random.split(key)
        params = self.model.init(
            kp, jnp.zeros((1, self.obs_dim)), jnp.zeros((1, self.reward_dim)), jnp.zeros((1,))
        )
        ts = TrainState.create(apply_fn=self.model.apply, params=params, tx=optax.adam(cfg.learning_rate))
        buffer = EpisodicBuffer.create(
            cfg.max_buffer_episodes,
            cfg.max_episode_len,
            self.obs_dim,
            self.reward_dim,
            action_dtype=jnp.float32 if self.continuous else jnp.int32,
        )
        return PCNState(
            ts=ts,
            buffer=buffer,
            key=key,
            global_step=jnp.int32(0),
            desired_return=jnp.zeros((self.reward_dim,)),
            desired_horizon=jnp.asarray(float(cfg.max_episode_len)),
        )

    # ------------------------------------------------------- episode collection

    @partial(jax.jit, static_argnums=(0, 4))
    def collect_episodes(self, ts, commands, key, greedy: bool = False):
        """Run num_envs episodes in parallel, each with its own (return, horizon) command.

        commands: (N, d+1).  Returns an EpisodeBatch (N episodes, padded).
        """
        cfg = self.cfg
        env = self.env
        N = commands.shape[0]
        T = cfg.max_episode_len

        def one(cmd, k):
            k0, krun = jax.random.split(k)
            st, obs = env.reset(k0)
            dr0, dh0 = cmd[: self.reward_dim], cmd[self.reward_dim]

            def body(carry, _):
                st, obs, dr, dh, done, k = carry
                k, ka, ks = jax.random.split(k, 3)
                pred = self.model.apply(ts.params, obs[None], dr[None], dh[None])[0]
                if self.continuous:
                    action = pred
                else:
                    action = jnp.where(greedy, jnp.argmax(pred), jax.random.categorical(ka, pred))
                out = env.step(st, action, ks)
                # command update (reference _run_episode)
                ndr = jnp.clip((dr - out.reward) / jnp.maximum(cfg.gamma, 1e-8), -1e5, 1e5)
                ndh = jnp.maximum(dh - 1.0, 1.0)
                rec = (obs, action, out.reward, 1.0 - done)
                new_done = jnp.maximum(done, (out.terminated | out.truncated).astype(jnp.float32))
                dr = jnp.where(done > 0, dr, ndr)
                dh = jnp.where(done > 0, dh, ndh)
                return (out.state, out.obs, dr, dh, new_done, k), rec

            init = (st, obs, dr0, dh0, jnp.float32(0.0), krun)
            _, (obs_t, act_t, rew_t, live_t) = jax.lax.scan(body, init, None, length=T)
            length = jnp.sum(live_t).astype(jnp.int32)
            # discounted return of the episode
            disc = cfg.gamma ** jnp.arange(T, dtype=jnp.float32)
            vec_return = jnp.einsum("td,t->d", rew_t, disc * live_t)
            return obs_t, act_t, rew_t * live_t[:, None], length, vec_return

        keys = jax.random.split(key, N)
        obs_t, act_t, rew_t, lengths, vec_returns = jax.vmap(one)(commands, keys)
        return EpisodeBatch(
            obs=obs_t,
            action=act_t if not self.continuous else act_t,
            reward=rew_t,
            length=jnp.maximum(lengths, 1),
            vec_return=vec_returns,
            horizon=jnp.maximum(lengths, 1).astype(jnp.float32),
        )

    # ---------------------------------------------------------------- commands

    def choose_commands(self, buffer: EpisodicBuffer, key, n: int):
        """(N, d+1) commands from non-dominated episodes (reference :281-300)."""
        cfg = self.cfg
        vals, hors, valid = jax.tree.map(np.asarray, buffer.top_returns(min(int(buffer.size), 20) or 1))
        vals, hors, valid = np.asarray(vals), np.asarray(hors), np.asarray(valid)
        finite = np.isfinite(vals).all(axis=1)
        vals, hors = vals[valid & finite], hors[valid & finite]
        if len(vals) == 0:
            vals = np.zeros((1, self.reward_dim))
            hors = np.ones((1,)) * cfg.max_episode_len
        nd = np.asarray(non_dominated_mask(jnp.asarray(vals)))
        vals, hors = vals[nd], hors[nd]
        rng = np.random.default_rng(int(jax.random.randint(key, (), 0, 2**30)))
        std = np.nan_to_num(vals.std(axis=0), nan=0.0, posinf=0.0, neginf=0.0)
        cmds = []
        for _ in range(n):
            i = rng.integers(0, len(vals))
            dr = vals[i].copy()
            j = rng.integers(0, self.reward_dim)
            dr[j] += rng.uniform(0, max(std[j], 1e-3)) * cfg.noise_std_scale
            dh = max(hors[i] - 2.0, 1.0)
            cmds.append(np.concatenate([dr, [dh]]))
        return jnp.asarray(np.stack(cmds), dtype=jnp.float32)

    # ------------------------------------------------------------------ update

    @partial(jax.jit, static_argnums=(0,))
    def update_model(self, ts: TrainState, buffer: EpisodicBuffer, key):
        cfg = self.cfg

        def one(ts, k):
            obs, action, rtg, horizon = buffer.sample_steps(k, cfg.batch_size, cfg.gamma)

            def loss_fn(params):
                pred = self.model.apply(params, obs, rtg, horizon)
                if self.continuous:
                    return jnp.mean((pred - action) ** 2)
                logp = jax.nn.log_softmax(pred)
                return -jnp.mean(jnp.take_along_axis(logp, action[:, None].astype(jnp.int32), axis=1))

            loss, grads = jax.value_and_grad(loss_fn)(ts.params)
            return ts.apply_gradients(grads=grads), loss

        ts, losses = jax.lax.scan(one, ts, jax.random.split(key, cfg.num_model_updates))
        return ts, jnp.mean(losses)

    # ------------------------------------------------------------------- train

    def train(
        self,
        total_timesteps: int,
        ref_point: np.ndarray | None = None,
        known_pareto_front: np.ndarray | None = None,
        num_er_episodes: int = 32,
        eval_freq: int | None = None,
        state: PCNState | None = None,
    ) -> PCNState:
        cfg = self.cfg
        state = state if state is not None else self.init_state()
        key = state.key
        # warmup: random-policy episodes (commands near zero -> random-ish logits)
        key, k0, k1 = jax.random.split(key, 3)
        warm_cmds = jnp.concatenate(
            [
                jax.random.normal(k0, (num_er_episodes, self.reward_dim)),
                jnp.full((num_er_episodes, 1), float(cfg.max_episode_len)),
            ],
            axis=1,
        )
        for i in range(0, num_er_episodes, cfg.num_envs):
            eps = self.collect_episodes(state.ts, warm_cmds[i : i + cfg.num_envs], jax.random.fold_in(k1, i))
            state = state._replace(buffer=state.buffer.add_episodes(eps, lorenz_lambda=self._buffer_rank_lambda))
            state = state._replace(global_step=state.global_step + jnp.sum(eps.length))

        last_eval = -(10**18)
        while int(state.global_step) < total_timesteps:
            key, ku, kc, ke = jax.random.split(key, 4)
            ts, loss = self.update_model(state.ts, state.buffer, ku)
            cmds = self.choose_commands(state.buffer, kc, cfg.num_envs)
            eps = self.collect_episodes(ts, cmds, ke)
            state = state._replace(
                ts=ts,
                buffer=state.buffer.add_episodes(eps, lorenz_lambda=self._buffer_rank_lambda),
                global_step=state.global_step + jnp.sum(eps.length),
                desired_return=cmds[0, : self.reward_dim],
                desired_horizon=cmds[0, self.reward_dim],
            )
            if eval_freq is not None and int(state.global_step) - last_eval < eval_freq:
                continue
            last_eval = int(state.global_step)
            if ref_point is not None:
                front, valid = np.asarray(state.buffer.data.vec_return), np.asarray(
                    np.arange(state.buffer.capacity) < int(state.buffer.size)
                )
                front = front[valid & np.isfinite(front).all(axis=1)]
                eval_weights = np.ones((1, self.reward_dim)) / self.reward_dim
                from ..core.weights import equally_spaced_weights

                ew = equally_spaced_weights(self.reward_dim, 32)
                metrics = multi_policy_metrics(front, np.asarray(ref_point), ew, known_pareto_front)
                self.logger.log(metrics, int(state.global_step))
                self._last_front, self._last_metrics = front, metrics
        state = state._replace(key=key)
        return state

    # -------------------------------------------------------------------- eval

    @partial(jax.jit, static_argnums=(0,))
    def eval_commands(self, ts, commands, key):
        """Re-execute desired returns greedily (reference :360-376)."""
        eps = self.collect_episodes(ts, commands, key, greedy=True)
        return eps.vec_return
