"""pgica_tpu.training subpackage."""
from pgica_tpu.training.train_step import (
    TrainState,
    make_stage1_train_step,
    make_stage1_eval_step,
    make_stage2_train_step,
    make_stage2_eval_step,
)
from pgica_tpu.training.cp_step import (
    make_stage2_cp_eval_step,
    make_stage2_cp_train_step,
)
from pgica_tpu.training.optim import create_optimizer, warmup_cosine_schedule, freeze_labels
from pgica_tpu.training.checkpoint import CheckpointManager
from pgica_tpu.training.trainer import PreferenceGuidedTrainer
