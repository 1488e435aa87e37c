"""Hyperparameter search harness — local random search over seeds.

Counterpart of reference experiments/hyperparameter_search/launch_sweep.py:
34-188, which runs wandb bayes sweeps maximizing ``avg_hypervolume`` over N
seeds in a process pool.  wandb is not available in this image, so this is a
self-contained random-search harness with the same objective: each trial
samples a config from the search space, trains ``num_seeds`` seeded runs, and
is scored by the mean final hypervolume.  Results stream to a JSONL file.

Search-space spec (JSON): {"param": {"values": [...]}} or
{"param": {"min": lo, "max": hi, "log": true}}.

Usage:
    python -m morl_baselines_tpu.cli.sweep --algo envelope \
        --env-id deep-sea-treasure-v0 --ref-point 0 -50 \
        --space '{"learning_rate": {"min": 1e-4, "max": 1e-2, "log": true},
                  "batch_size": {"values": [64, 128]}}' \
        --num-trials 10 --num-seeds 3 --num-timesteps 20000
"""

from __future__ import annotations

import argparse
import dataclasses
import inspect
import json
import time

import numpy as np

from ..envs.registry import make
from .experiments import ALGOS


def sample_config(space: dict, rng: np.random.Generator) -> dict:
    out = {}
    for k, spec in space.items():
        if "values" in spec:
            v = spec["values"][rng.integers(0, len(spec["values"]))]
        elif spec.get("log"):
            v = float(np.exp(rng.uniform(np.log(spec["min"]), np.log(spec["max"]))))
        else:
            v = float(rng.uniform(spec["min"], spec["max"]))
        out[k] = v
    return out


def run_trial(algo: str, env_id: str, ref_point, overrides: dict, num_seeds: int, num_timesteps: int, train_kwargs=None):
    """Mean final hypervolume over seeds (the sweep objective, reference :100-141)."""
    scores = []
    for seed in range(num_seeds):
        env = make(env_id)
        algo_cls = ALGOS[algo]
        sig = inspect.signature(algo_cls.__init__)
        kwargs = {}
        if "config" in sig.parameters:
            default_cfg = sig.parameters["config"].default
            kwargs["config"] = dataclasses.replace(default_cfg, seed=seed, **overrides)
        if "ref_point" in sig.parameters:
            kwargs["ref_point"] = np.asarray(ref_point)
        if "origin" in sig.parameters:
            kwargs["origin"] = np.asarray(ref_point)
        if "weights" in sig.parameters:
            kwargs["weights"] = np.ones(env.reward_dim) / env.reward_dim
        agent = algo_cls(env, **kwargs)
        tkw = dict(train_kwargs or {})
        tsig = inspect.signature(agent.train)
        if "ref_point" in tsig.parameters:
            tkw.setdefault("ref_point", np.asarray(ref_point))
        agent.train(num_timesteps, **tkw)
        hv = agent._last_metrics.get("eval/hypervolume", 0.0) if hasattr(agent, "_last_metrics") else 0.0
        scores.append(hv)
    return float(np.mean(scores)), scores


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--algo", required=True, choices=list(ALGOS))
    parser.add_argument("--env-id", required=True)
    parser.add_argument("--ref-point", type=float, nargs="+", required=True)
    parser.add_argument("--space", type=str, required=True, help="JSON search space")
    parser.add_argument("--num-trials", type=int, default=10)
    parser.add_argument("--num-seeds", type=int, default=3)
    parser.add_argument("--num-timesteps", type=int, default=50_000)
    parser.add_argument("--out", type=str, default="sweep_results.jsonl")
    parser.add_argument("--sweep-seed", type=int, default=0)
    args = parser.parse_args(argv)

    space = json.loads(args.space)
    rng = np.random.default_rng(args.sweep_seed)
    best = (-np.inf, None)
    with open(args.out, "a") as f:
        for trial in range(args.num_trials):
            overrides = sample_config(space, rng)
            t0 = time.time()
            score, scores = run_trial(
                args.algo, args.env_id, args.ref_point, overrides, args.num_seeds, args.num_timesteps
            )
            rec = {
                "trial": trial,
                "overrides": overrides,
                "avg_hypervolume": score,
                "seed_hypervolumes": scores,
                "wall_s": time.time() - t0,
            }
            f.write(json.dumps(rec) + "\n")
            f.flush()
            print(json.dumps(rec))
            if score > best[0]:
                best = (score, overrides)
    print("best:", best)
    return best


if __name__ == "__main__":
    main()
