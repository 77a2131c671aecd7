"""Importable FakeEnv/oracle factories for dotted-path config targets
(training.TaskRolloutConfig.env_target / oracle_target)."""

from mdt_policy_tpu.evaluation.fake_env import FakeEnv


class DiscoveryOracle:
    """Oracle double covering both halves of the Rollout callback protocol:
    `get_task_info` (demo discovery, ref rollout.py:374-421) always maps the
    demo to one fixed real task; `get_task_info_for_set` (rollout success)
    solves any task after `solve_after` env steps."""

    def __init__(self, task: str = "open_drawer", solve_after: int = 1):
        self.task = task
        self.solve_after = solve_after

    def get_task_info(self, start_info, end_info):
        return {self.task}

    def get_task_info_for_set(self, start_info, current_info, subtasks):
        if current_info["t"] - start_info["t"] >= self.solve_after:
            return set(subtasks or {self.task})
        return set()


def make_env(dataset_path=None):
    return FakeEnv(img_hw=32, gripper_hw=32)


def make_oracle():
    return DiscoveryOracle()
