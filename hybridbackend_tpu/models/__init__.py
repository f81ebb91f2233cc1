from hybridbackend_tpu.models.feature import (
    EmbeddingSpec, StackedFeatureExtractor, extract_features, init_tables)
from hybridbackend_tpu.models.layers import (
    dense_apply, dense_init, mlp_apply, mlp_init)
from hybridbackend_tpu.models.ranking import (
    din_apply, din_init, din_session_apply, din_session_init,
    dlrm_apply, dlrm_init, stacked_dcn_v2_apply, stacked_dcn_v2_init)
