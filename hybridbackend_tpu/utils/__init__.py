from hybridbackend_tpu.utils.profiler import profile_trace, named_scope
