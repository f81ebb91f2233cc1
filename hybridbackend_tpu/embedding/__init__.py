from hybridbackend_tpu.embedding.table import (
    TableConfig, create_table, default_initializer)
from hybridbackend_tpu.embedding.lookup import lookup, lookup_sparse
from hybridbackend_tpu.embedding.unique import unique, UniqueResult
