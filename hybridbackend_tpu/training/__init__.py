from hybridbackend_tpu.training.train import (
    TrainState, make_train_step, make_eval_step, replicate_over_mesh)
from hybridbackend_tpu.training.optimizer import (
    is_embedding_path, split_trees, multi_optimizer, sharding_aware_init)
from hybridbackend_tpu.training.checkpoint import CheckpointManager
from hybridbackend_tpu.training.hooks import (
    SummaryHook,
    Hook, StepStatHook, Policy, LoggingHook)
from hybridbackend_tpu.training.sparse_step import (
    SparseTrainState, make_sparse_train_step)
from hybridbackend_tpu.training.optimizer import (
    lr_with_linear_warmup_and_polynomial_decay)
