"""Dense-gradient wire compression (round-3 order #5).

The reference casts gradient collectives on the wire generally
(``/root/reference/hybridbackend/tensorflow/distribute/collective.py:291-296``
+ ``common/cast.cu.cc:37-488``). Here ``comm_gradient_wire_dtype``
reaches the DENSE parameter gradients too: ``make_train_step`` builds an
explicit shard_map reduction whose psum summand is cast to the wire
dtype (GSPMD's implicit allreduce is always accumulator-precision).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

import hybridbackend_tpu as hb
from hybridbackend_tpu.framework.context import Context
from hybridbackend_tpu.training.train import TrainState, make_train_step


def _toy_batch(rng, n=64):
  x = rng.rand(n, 8).astype(np.float32)
  y = (x.sum(1) > 4.0).astype(np.float32)
  return {'x': x, 'label': y}


def _loss_fn(params, batch):
  h = jnp.tanh(batch['x'] @ params['w1'])
  logits = (h @ params['w2'])[:, 0]
  preds = jax.nn.sigmoid(logits)
  p = jnp.clip(preds, 1e-6, 1 - 1e-6)
  y = batch['label']
  pel = -(y * jnp.log(p) + (1 - y) * jnp.log(1 - p))
  return jnp.mean(pel), {'preds': preds}


def _params(seed=0):
  rng = np.random.RandomState(seed)
  return {'w1': jnp.asarray(rng.randn(8, 16).astype(np.float32) * 0.3),
          'w2': jnp.asarray(rng.randn(16, 1).astype(np.float32) * 0.3)}


def _put(batch, ctx):
  return {k: jax.device_put(v, ctx.batch_sharding if v.ndim == 1
                            else ctx.sharding(ctx.data_axes, None))
          for k, v in batch.items()}


def test_hlo_bf16_allreduce():
  """With the option set, the program's cross-replica gradient psum
  operates on bf16 operands; without it, no bf16 reduction exists.

  Asserted on the LOWERED (pre-backend-optimization) module: the CPU
  backend legalizes bf16 collectives by upcasting around them, while TPU
  executes them natively — the portable property is what the program
  requests on the wire."""
  ctx = Context.get()
  opt = optax.sgd(0.1)

  def lower(wire):
    with hb.scope(comm_gradient_wire_dtype=wire):
      state = TrainState.create(_params(), opt, ctx)
      step = make_train_step(_loss_fn, opt, ctx,
                             params_template=state.params)
      batch = _put(_toy_batch(np.random.RandomState(0)), ctx)
      return step.lower(state, batch).as_text()

  def bf16_all_reduce(hlo):
    # StableHLO puts the op's type signature lines after the op line;
    # scan a small window (the reduction region's scalar add carries
    # `tensor<bf16>` and the signature `tensor<NxMxbf16>`).
    lines = hlo.splitlines()
    for i, l in enumerate(lines):
      if 'all_reduce' in l:
        if any('bf16' in w for w in lines[i:i + 8]):
          return True
    return False

  hlo_c = lower('bfloat16')
  assert 'all_reduce' in hlo_c
  assert bf16_all_reduce(hlo_c)

  # f32: the step stays on the GSPMD path (no explicit shard_map
  # all_reduce in the lowered module — the partitioner inserts it at
  # compile time) and nothing rides bf16.
  hlo_f = lower('float32')
  assert 'bf16' not in hlo_f


def test_convergence_parity():
  """bf16-on-the-wire training tracks f32 training closely on the toy
  model (convergence parity, not bit equality)."""
  ctx = Context.get()
  opt = optax.sgd(0.5)
  rng = np.random.RandomState(1)
  batches = [_toy_batch(rng) for _ in range(30)]

  def run(wire):
    with hb.scope(comm_gradient_wire_dtype=wire):
      state = TrainState.create(_params(3), opt, ctx)
      step = make_train_step(_loss_fn, opt, ctx,
                             params_template=state.params)
      losses = []
      for b in batches:
        state, m = step(state, _put(b, ctx))
        losses.append(float(m['loss']))
      return losses

  f32 = run('float32')
  bf16 = run('bfloat16')
  assert f32[-1] < f32[0]
  assert bf16[-1] < bf16[0]
  # Same trajectory within bf16 noise.
  np.testing.assert_allclose(bf16[-1], f32[-1], rtol=0.05, atol=0.01)


def test_sharded_leaves_fall_back_to_gspmd():
  """Params with a mesh-sharded leaf (embedding-table-like) can't run
  the manual-SPMD wire path (the loss indexes the table as a GLOBAL
  array): the step must fall back to GSPMD and stay correct; table
  grads stay shard-local there (reference gradient.py:197-207)."""
  ctx = Context.get()
  opt = optax.sgd(0.1)
  table = jax.device_put(
      jnp.ones((64, 4)), ctx.sharding(ctx.data_axes, None))

  def loss_fn(params, batch):
    emb = jnp.take(params['table'], batch['ids'], axis=0)
    preds = jax.nn.sigmoid(emb.sum((1, 2)) + (batch['x'] @ params['w'])[:, 0])
    return jnp.mean((preds - batch['label']) ** 2), {'preds': preds}

  params = {'table': table, 'w': jnp.zeros((8, 1), jnp.float32)}
  with hb.scope(comm_gradient_wire_dtype='bfloat16'):
    state = TrainState.create(params, opt, ctx)
    step = make_train_step(loss_fn, opt, ctx, params_template=state.params)
    rng = np.random.RandomState(2)
    b = _toy_batch(rng)
    b['ids'] = rng.randint(0, 64, (64, 2)).astype(np.int32)
    batch = _put(b, ctx)
    state2, _ = step(state, batch)
  # The sharded table still updated (local grads applied; sigmoid is
  # near-saturated so the update is small but nonzero)...
  assert np.abs(np.asarray(state2.params['table']) - 1.0).max() > 1e-7
  # ...and it stayed sharded.
  assert len(state2.params['table'].sharding.device_set) == 8
