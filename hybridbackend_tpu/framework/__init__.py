from hybridbackend_tpu.framework.options import OPTIONS, Options
from hybridbackend_tpu.framework.context import (
    Context, build_mesh, context_scope, scope,
    DATA_AXIS, DCN_AXIS, ICI_AXIS)
