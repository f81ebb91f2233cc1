"""hybridbackend_tpu: a TPU-native wide-and-deep recommender framework.

A ground-up JAX/XLA/Pallas re-design with the capabilities of
DeepRec-AI/HybridBackend (reference at /root/reference): columnar
Parquet/ORC ingest of ragged categorical features, row-sharded embedding
tables with all-to-all / all-gather exchange over ICI/DCN, data-parallel
dense towers, in-training evaluation with globally exact metrics, and
world-size-independent sharded checkpointing.
"""

__version__ = '0.1.0'

from hybridbackend_tpu.framework.context import (
    Context, build_mesh, context_scope, embedding_scope, scope)
from hybridbackend_tpu.framework.options import OPTIONS

from hybridbackend_tpu import data
from hybridbackend_tpu import distribute
from hybridbackend_tpu import embedding
from hybridbackend_tpu import estimator
from hybridbackend_tpu import metrics
from hybridbackend_tpu import models
from hybridbackend_tpu import pipeline
from hybridbackend_tpu import training
from hybridbackend_tpu.estimator import Trainer
