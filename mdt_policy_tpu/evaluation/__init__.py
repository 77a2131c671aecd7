from .tasks import TASKS, TASK_CATEGORIES
from .sequences import check_sequence, get_sequences, temp_seed, valid_task
from .initial_states import get_env_state_for_initial_condition
from .rollout import (
    LangEmbeddings,
    count_success,
    evaluate_policy,
    evaluate_sequence,
    print_and_save,
    rollout,
)
