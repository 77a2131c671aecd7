"""Evaluation-stack tests: chain-generator determinism + validity, parity with
the reference generator (loaded from /root/reference with a stubbed utils
module), initial-state determinism, success accounting, and the rollout driver
over the CALVIN-free fake env."""

import importlib.util
import sys
import types
from conftest import stub_module
from pathlib import Path

import numpy as np
import pytest

from mdt_policy_tpu.evaluation import (
    TASKS,
    TASK_CATEGORIES,
    check_sequence,
    count_success,
    evaluate_sequence,
    get_env_state_for_initial_condition,
    get_sequences,
)
from mdt_policy_tpu.evaluation.fake_env import FakeEnv, RandomPolicy, ScriptedOracle


class TestSequences:
    def test_34_tasks_and_categories(self):
        assert len(TASKS) == 34
        assert set(TASKS) == set(TASK_CATEGORIES)

    def test_chains_valid_and_deterministic(self):
        get_sequences.cache_clear()
        seqs = get_sequences(64)
        assert len(seqs) == 64
        for state, chain in seqs:
            assert len(chain) == 5
            assert check_sequence(dict(state), chain)
            cats = [TASK_CATEGORIES[t] for t in chain]
            assert len(set(cats)) == 5
        get_sequences.cache_clear()
        seqs2 = get_sequences(64)
        assert [c for _, c in seqs] == [c for _, c in seqs2]

    def test_parity_with_reference_generator(self):
        """Load the reference multistep_sequences with a stubbed
        mdt.evaluation.utils and compare chains exactly."""
        ref_path = Path("/root/reference/mdt/evaluation/multistep_sequences.py")
        if not ref_path.exists():
            pytest.skip("reference not mounted")
        # stub the package chain mdt.evaluation.utils -> temp_seed
        from mdt_policy_tpu.evaluation.sequences import temp_seed
        for name in ("mdt", "mdt.evaluation"):
            sys.modules.setdefault(name, stub_module(name))
        utils_stub = stub_module("mdt.evaluation.utils")
        utils_stub.temp_seed = temp_seed
        sys.modules["mdt.evaluation.utils"] = utils_stub
        spec = importlib.util.spec_from_file_location("ref_multistep", ref_path)
        ref = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(ref)

        # the spec-loaded module's functions can't pickle into subprocesses;
        # run its pool serially (identical results: workers self-seed)
        class SerialExecutor:
            """Runs serially but isolates each call's global-RNG mutations,
            like real subprocesses would."""
            def __init__(self, max_workers=None): pass
            def __enter__(self): return self
            def __exit__(self, *a): return False
            def map(self, fn, it):
                out = []
                for x in it:
                    st = np.random.get_state()
                    out.append(fn(x))
                    np.random.set_state(st)
                return out

        ref.ProcessPoolExecutor = SerialExecutor

        n = 48
        ref_out = ref.get_sequences(n, num_workers=1)
        get_sequences.cache_clear()
        ours = get_sequences(n)
        assert len(ref_out) == len(ours)
        for (ref_state, ref_chain), (our_state, our_chain) in zip(ref_out, ours):
            assert dict(ref_state) == dict(our_state)
            assert tuple(ref_chain) == tuple(our_chain)


class TestInitialStates:
    def test_deterministic_and_structured(self):
        cond = {"led": 0, "lightbulb": 1, "slider": "left", "drawer": "open",
                "red_block": "table", "blue_block": "slider_right",
                "pink_block": "slider_left", "grasped": 0}
        r1, s1 = get_env_state_for_initial_condition(cond)
        r2, s2 = get_env_state_for_initial_condition(cond)
        np.testing.assert_array_equal(s1, s2)
        assert r1.shape == (15,) and s1.shape == (24,)
        assert s1[0] == 0.28 and s1[1] == 0.22  # slider left, drawer open
        assert s1[3] == pytest.approx(0.088) and s1[4] == 1 and s1[5] == 0
        np.testing.assert_array_almost_equal(
            s1[12:15], [7.03416330e-02, 9.24044687e-02, 4.60990009e-01])  # blue in right slider
        np.testing.assert_array_almost_equal(
            s1[18:21], [-2.40851662e-01, 9.24044687e-02, 4.60990009e-01])  # pink in left slider
        # rotations inside the sampled range
        for ang in (s1[11], s1[17], s1[23]):
            assert np.pi / 2 - np.pi / 8 <= ang <= np.pi / 2 + np.pi / 8

    def test_different_conditions_differ(self):
        c1 = {"led": 0, "lightbulb": 0, "slider": "left", "drawer": "open",
              "red_block": "table", "blue_block": "slider_right",
              "pink_block": "slider_left", "grasped": 0}
        c2 = dict(c1, led=1)
        _, s1 = get_env_state_for_initial_condition(c1)
        _, s2 = get_env_state_for_initial_condition(c2)
        assert not np.array_equal(s1, s2)


class TestCountSuccess:
    def test_golden(self):
        # chains completing 5, 3, 0 subtasks
        sr = count_success([5, 3, 0])
        assert sr == [2 / 3, 2 / 3, 2 / 3, 1 / 3, 1 / 3]
        assert count_success([0, 0]) == [0.0] * 5
        assert count_success([5]) == [1.0] * 5


class TestRolloutDriver:
    def test_chain_stops_at_first_failure(self):
        env = FakeEnv()
        policy = RandomPolicy()
        get_sequences.cache_clear()
        state, chain = get_sequences(4)[0]
        # first two tasks solvable quickly, third never
        oracle = ScriptedOracle({chain[0]: 2, chain[1]: 3})
        goal_fn = lambda sub: {"lang_text": f"do {sub}"}
        n = evaluate_sequence(env, policy, oracle, dict(state), chain, goal_fn,
                              ep_len=20)
        assert n == 2

    def test_all_success(self):
        env = FakeEnv()
        policy = RandomPolicy()
        get_sequences.cache_clear()
        state, chain = get_sequences(4)[1]
        oracle = ScriptedOracle({t: 1 for t in chain})
        n = evaluate_sequence(env, policy, oracle, dict(state), chain,
                              lambda s: {"lang_text": s}, ep_len=5)
        assert n == 5

    def test_video_recording(self, tmp_path):
        """evaluate_policy(num_videos=N) records the first N chains as GIFs
        with outcome borders (ref mdt_evaluate.py:112-143)."""
        from mdt_policy_tpu.evaluation.rollout import evaluate_policy

        env = FakeEnv()
        policy = RandomPolicy()
        get_sequences.cache_clear()
        oracle = ScriptedOracle(default=2)  # every subtask solves at step 2
        results = evaluate_policy(
            policy, env, oracle, lambda s: {"lang_text": f"do {s}"},
            num_sequences=3, ep_len=5, progress=False,
            num_videos=2, video_dir=tmp_path)
        assert results == [5, 5, 5]
        gifs = sorted(tmp_path.glob("*.gif"))
        assert [g.name for g in gifs] == ["lh-sequence_0.gif", "lh-sequence_1.gif"]
        from PIL import Image
        with Image.open(gifs[0]) as im:
            # 5 subtasks x 2 frames each
            assert im.n_frames == 10
            # success border: first row tinted green (GIF quantization may
            # shift exact values; green must dominate)
            r, g, b = np.asarray(im.convert("RGB"))[0, 0].astype(int)
            assert g > r and g > b
