"""Batched multi-env rollout must produce the same per-chain semantics as the
serial driver: success counting stops at the first failed subtask, chunk
re-planning happens every `multistep` ticks."""

import numpy as np

from mdt_policy_tpu.evaluation import get_sequences
from mdt_policy_tpu.evaluation.batched_rollout import (
    BatchedPolicyAdapter,
    evaluate_policy_batched,
)
from mdt_policy_tpu.evaluation.fake_env import FakeEnv, ScriptedOracle


class CountingPredict:
    """Batched predict double counting invocations."""
    def __init__(self, n_envs, action_dim=7, window=10):
        self.calls = 0
        self.n_envs = n_envs
        self.shape = (n_envs, window, action_dim)

    def __call__(self, obs_batch, goals):
        self.calls += 1
        return np.zeros(self.shape, np.float32)


def test_batched_matches_expected_counts():
    get_sequences.cache_clear()
    n_envs, n_seq = 4, 8
    envs = [FakeEnv(seed=i) for i in range(n_envs)]
    # every task solves after 5 env steps -> all chains score 5
    oracle = ScriptedOracle(default=5)
    predict = CountingPredict(n_envs)
    policy = BatchedPolicyAdapter(predict, multistep=10)
    results = evaluate_policy_batched(
        policy, envs, oracle, lambda s: {"lang_text": s},
        num_sequences=n_seq, ep_len=20, progress=False)
    assert results == [5] * n_seq
    # 2 waves x 5 subtasks; each subtask takes 5 ticks -> one re-plan each
    assert predict.calls == 2 * 5 * 1


def test_batched_partial_failures():
    get_sequences.cache_clear()
    n_envs, n_seq = 3, 3
    seqs = get_sequences(n_seq)
    # chain 0 solves everything fast; chain 1's second task never solves;
    # chain 2's first task never solves
    solve_at = {}
    for i, (_, chain) in enumerate(seqs):
        for j, t in enumerate(chain):
            default_ok = 2
            if (i == 1 and j == 1) or (i == 2 and j == 0):
                continue  # leave unsolvable
            solve_at.setdefault(t, default_ok)
    # remove tasks that some chain needs unsolvable but another needs solvable:
    # ScriptedOracle is global per task, so drop conflicts from solve_at
    unsolvable = {seqs[1][1][1], seqs[2][1][0]}
    for t in unsolvable:
        solve_at.pop(t, None)
    oracle = ScriptedOracle(solve_at)
    envs = [FakeEnv(seed=i) for i in range(n_envs)]
    policy = BatchedPolicyAdapter(CountingPredict(n_envs), multistep=10)
    results = evaluate_policy_batched(
        policy, envs, oracle, lambda s: {"lang_text": s},
        num_sequences=n_seq, ep_len=8, progress=False)
    # each chain's count == index of its first unsolvable task
    for i, (_, chain) in enumerate(seqs):
        expected = 0
        for t in chain:
            if t in unsolvable or t not in solve_at:
                break
            expected += 1
        assert results[i] == expected, (i, chain, results)
