"""Tests for the collective layer (parity with the reference's
distribute/tests: allreduce_test.py, alltoall_test.py, allgather_test.py,
broadcast_test.py — cross-replica numerical equality)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

import hybridbackend_tpu.distribute as hbd
from hybridbackend_tpu.framework.context import Context


class TestAllreduce:

  def test_sum(self):
    x = jnp.arange(16.0).reshape(4, 4)
    out = hbd.allreduce(x)  # replicated input: every shard holds x
    np.testing.assert_allclose(np.asarray(out), np.asarray(x) * 8)

  def test_max_min(self):
    x = jnp.arange(8.0)
    np.testing.assert_allclose(np.asarray(hbd.allreduce(x, 'max')),
                               np.asarray(x))
    np.testing.assert_allclose(np.asarray(hbd.allreduce(x, 'min')),
                               np.asarray(x))

  def test_mean(self):
    x = jnp.full((4,), 3.0)
    np.testing.assert_allclose(np.asarray(hbd.allreduce(x, 'mean')),
                               np.full((4,), 3.0))

  def test_grad_is_allreduced(self):
    # Reference: allreduce custom gradient allreduces the grad
    # (collective.py:192-209). JAX: autodiff of psum.
    def loss(x):
      return jnp.sum(hbd.allreduce(x) ** 2)
    x = jnp.ones((2,))
    g = jax.grad(loss)(x)
    # y = 8x per shard; dy/dx accumulates 8 * 2*8 = 128 per element.
    np.testing.assert_allclose(np.asarray(g), np.full((2,), 128.0))

  def test_unsupported_reduction(self):
    with pytest.raises(ValueError):
      hbd.allreduce(jnp.ones(4), 'prod')


class TestBroadcast:

  def test_broadcast_replicated(self):
    x = jnp.arange(6.0)
    out = hbd.broadcast(x, root=0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x))

  def test_broadcast_int(self):
    x = jnp.arange(6, dtype=jnp.int32)
    out = hbd.broadcast(x, root=3)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))

  def test_broadcast_selects_root_shard(self):
    # Give each shard a distinct value via shard_map, then broadcast.
    ctx = Context.get()
    axes = ctx.data_axes

    def distinct(_):
      me = hbd.axis_index_t(axes)
      return jnp.full((2,), me, jnp.float32)

    vals = jax.shard_map(distinct, mesh=ctx.mesh, in_specs=P(),
                         out_specs=P(axes))(jnp.zeros(()))
    # vals is [16] = per-shard [2] stacked; broadcast shard 5's value.
    def bcast(v):
      return hbd.broadcast_t(v, axes, root=5)
    out = jax.shard_map(bcast, mesh=ctx.mesh, in_specs=P(axes),
                        out_specs=P(axes))(vals)
    np.testing.assert_allclose(np.asarray(out),
                               np.full((16,), 5.0))


class TestAllgather:

  def test_allgather_concats_shards(self):
    x = jnp.arange(16.0)  # sharded into 8 shards of 2
    out = hbd.allgather(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x))


class TestAlltoall:

  def test_alltoall_transpose(self):
    # Global [64, 3]: device d holds rows [8d, 8d+8). After alltoall each
    # device holds the d-th row-of-8 of every device.
    x = jnp.arange(64 * 3, dtype=jnp.float32).reshape(64, 3)
    out = hbd.alltoall(x)
    xs = np.asarray(x).reshape(8, 8, 3)
    expected = np.transpose(xs, (1, 0, 2)).reshape(64, 3)
    np.testing.assert_allclose(np.asarray(out), expected)

  def test_alltoall_bf16_wire(self):
    x = jnp.ones((64, 4), jnp.float32) * 1.5
    out = hbd.alltoall(x, wire_dtype='bfloat16')
    assert out.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(out), np.asarray(x))


class TestAlltoallv:

  def test_bucketed_exchange(self):
    ctx = Context.get()
    axes = ctx.data_axes
    W, cap = 8, 4

    def body(_):
      me = hbd.axis_index_t(axes)
      # bucket[i] = payload me*10+i destined to peer i, size = 1 + (me % 3)
      buckets = (me * 10
                 + jax.lax.broadcasted_iota(jnp.int32, (W, cap), 0))
      sizes = jnp.full((W,), 1, jnp.int32) + me % 3
      recv, recv_sizes = hbd.all_to_all_v_t(buckets, sizes, axes)
      return recv[None], recv_sizes[None]

    recv, recv_sizes = jax.shard_map(
        body, mesh=ctx.mesh, in_specs=P(),
        out_specs=(P(axes), P(axes)))(jnp.zeros(()))
    recv = np.asarray(recv)          # [8(me), 8(src), cap]
    recv_sizes = np.asarray(recv_sizes)  # [8(me), 8(src)]
    for me in range(W):
      for src in range(W):
        # peer `src` sent bucket destined to `me`: values src*10 + me
        assert recv[me, src, 0] // 10 == src
        assert recv[me, src, 0] % 10 == me
        assert recv_sizes[me, src] == 1 + src % 3


class TestTopology:

  def test_axes_selection(self):
    ctx = Context.get()
    assert hbd.topology_axes(hbd.Topology.ALL, ctx) == ('dcn', 'ici')
    assert hbd.topology_axes(hbd.Topology.INTRA_NODE, ctx) == ('ici',)
    assert hbd.topology_axes(hbd.Topology.INTER_NODE, ctx) == ('dcn',)


class TestAlltoallv:
  """Array-level alltoallv/allgatherv (reference collective.py:485-549)."""

  def test_roundtrip_and_sizes(self):
    import jax.numpy as jnp
    ctx = Context.get()
    W, cap = 8, 3
    # device i sends to peer j the values i*10 + j, with sizes (i+j) % 3 + 1
    val = np.zeros((W, W, cap), np.float32)
    sizes = np.zeros((W, W), np.int32)
    for i in range(W):
      for j in range(W):
        sizes[i, j] = (i + j) % 3 + 1
        val[i, j, :sizes[i, j]] = i * 10 + j
    sharding = ctx.sharding(ctx.data_axes, None, None)
    v = jax.device_put(jnp.asarray(val), sharding)
    s = jax.device_put(jnp.asarray(sizes),
                       ctx.sharding(ctx.data_axes, None))
    recv, rs = hbd.alltoallv(v, s)
    recv, rs = np.asarray(recv), np.asarray(rs)
    for me in range(W):
      for src in range(W):
        assert rs[me, src] == (me + src) % 3 + 1
        assert (recv[me, src, :rs[me, src]] == src * 10 + me).all()

  def test_gradient_reverse_routing(self):
    """Cotangent of the received buckets returns to the sender's lanes
    (the reference's reverse-alltoallv gradient, collective.py:326-350)."""
    import jax.numpy as jnp
    ctx = Context.get()
    W, cap = 8, 2
    sizes = np.full((W, W), cap, np.int32)
    sharding = ctx.sharding(ctx.data_axes, None, None)
    s = jax.device_put(jnp.asarray(sizes), ctx.sharding(ctx.data_axes, None))

    def f(v):
      recv, _ = hbd.alltoallv(v, s)
      # weight received bucket [me, src] by (me+1)*(src+1)
      w = jnp.arange(1, W + 1, dtype=jnp.float32)
      return jnp.sum(recv * w[:, None, None] * w[None, :, None])

    v = jax.device_put(jnp.ones((W, W, cap), jnp.float32), sharding)
    g = np.asarray(jax.grad(f)(v))
    # d/dv[i, j]: v[i, j] lands at recv[j, i] with weight (j+1)*(i+1)
    for i in range(W):
      for j in range(W):
        assert (g[i, j] == (i + 1) * (j + 1)).all(), (i, j, g[i, j])

  def test_allgatherv_and_compact(self):
    import jax.numpy as jnp
    ctx = Context.get()
    W, cap = 8, 4
    val = np.zeros((W, cap, 2), np.float32)
    sizes = np.asarray([i % 3 + 1 for i in range(W)], np.int32)
    for i in range(W):
      val[i, :sizes[i]] = i + 1
    v = jax.device_put(jnp.asarray(val),
                       ctx.sharding(ctx.data_axes, None, None))
    s = jax.device_put(jnp.asarray(sizes), ctx.sharding(ctx.data_axes))
    g, gs = hbd.allgatherv(v, s)
    np.testing.assert_array_equal(np.asarray(gs), sizes)
    np.testing.assert_allclose(np.asarray(g), val)
    flat, valid = hbd.compact_rows(g, gs)
    flat, valid = np.asarray(flat), np.asarray(valid)
    total = sizes.sum()
    assert valid.sum() == total
    want = np.concatenate([np.full((sizes[i], 2), i + 1, np.float32)
                           for i in range(W)])
    np.testing.assert_allclose(flat[:total], want)
