from hybridbackend_tpu.utils.profiler import (
    dump_hlo, named_scope, profile_trace)
