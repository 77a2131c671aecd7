"""Vendored annotation/task tables must match the reference protocol exactly:
every one of the 34 tasks maps to its reference validation sentence, the
training sentence distribution is identical, and the symbolic task definitions
for the oracle match the reference hydra config."""

from pathlib import Path

import numpy as np
import pytest
import yaml

from mdt_policy_tpu.evaluation.annotations import (
    make_goal_fn,
    task_definitions,
    train_annotations,
    validation_annotations,
)
from mdt_policy_tpu.evaluation.tasks import TASKS

REF = Path("/root/reference")


def test_validation_annotations_match_reference():
    ours = validation_annotations()
    ref = yaml.safe_load(
        (REF / "conf/annotations/new_playtable_validation.yaml").read_text())
    assert ours == ref
    assert len(ours) == 34
    for task, sentences in ours.items():
        assert len(sentences) == 1, task


def test_train_annotations_match_reference():
    ours = train_annotations()
    ref = yaml.safe_load((REF / "conf/annotations/new_playtable.yaml").read_text())
    assert ours == ref
    assert set(ours) == set(validation_annotations())


def test_task_definitions_match_reference():
    ours = task_definitions()
    ref = yaml.safe_load(
        (REF / "conf/callbacks/rollout/tasks/new_playtable_tasks.yaml").read_text())
    assert ours == ref["tasks"]


def test_tables_cover_the_chain_generator_tasks():
    # the 34 tasks the chain generator emits all have an annotation and an
    # oracle definition
    assert set(TASKS) == set(validation_annotations())
    assert set(TASKS) == set(task_definitions())


def test_goal_fn_tokenizes_validation_sentence():
    goal_fn = make_goal_fn(77)
    goal = goal_fn("rotate_red_block_right")
    assert goal["lang_text"] == "take the red block and rotate it to the right"
    assert goal["lang_tokens"].shape == (1, 77)
    # differs from the synthesized task-name text the round-1 CLI used
    assert goal["lang_text"] != "rotate red block right"
    with pytest.raises(KeyError):
        goal_fn("not_a_task")


def test_goal_fn_embeddings_path():
    class FakeEmb:
        def get_lang_goal(self, text):
            return {"lang": np.full((1, 16), 0.5, np.float32), "lang_text": text}

    goal = make_goal_fn(77, lang_embeddings=FakeEmb())("open_drawer")
    assert goal["lang_text"] == "pull the handle to open the drawer"
    assert "lang_tokens" not in goal
    assert goal["lang"].shape == (1, 16)
