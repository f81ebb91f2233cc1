from hybridbackend_tpu.distribute.collective import (
    Topology, allreduce, allgather, allgatherv, alltoall, alltoallv,
    broadcast, compact_rows,
    psum_t, pmean_t, pmax_t, pmin_t, all_gather_t, psum_scatter_t,
    all_to_all_t, all_to_all_v_t, broadcast_t, axis_index_t, axis_size_t,
    topology_axes)
from hybridbackend_tpu.distribute.partition import (
    Partitioned, partition_by_modulo, partition_by_fn,
    partition_by_dual_modulo, unpartition)
