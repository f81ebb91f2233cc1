from hybridbackend_tpu.embedding.table import (
    TableConfig, create_table, default_initializer)
from hybridbackend_tpu.embedding.lookup import lookup, lookup_sparse
from hybridbackend_tpu.embedding.unique import unique, UniqueResult
from hybridbackend_tpu.embedding.stack import (
    TableStack, build_stacks, create_stacked_tables, stacked_lookup)
from hybridbackend_tpu.embedding.dynamic import DynamicEmbedding, IdMapper
from hybridbackend_tpu.embedding.service import (
    CachePlan, CacheRunner, EmbeddingCache, InMemoryStorage, Storage)
from hybridbackend_tpu.embedding.planner import (
    TablePlan, plan_scope_options, plan_sharding)
