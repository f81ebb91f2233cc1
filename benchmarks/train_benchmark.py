"""End-to-end training-step benchmark (flagship wide&deep ranking model).

Measures steps/s and examples/s of the full hybrid-parallel train step —
sharded embedding lookup + DCNv2/DLRM tower + multi-optimizer update —
on the current default backend (real TPU chip, or a virtual CPU mesh
with ``--cpu N``).

Timing recipe for remote-relay TPU backends where ``block_until_ready``
is unreliable: the step loop runs INSIDE jit via ``lax.scan`` with the
ids derived from the loop carry (prevents XLA from hoisting the body),
and the measurement forces a scalar readback.

Reference analogue: the reference publishes training throughput only in
the PICASSO paper; its repo harnesses time collectives and data loading
(``/root/reference/hybridbackend/tensorflow/benchmarks/``). This harness
is the missing end-to-end number.

Usage:
  python benchmarks/train_benchmark.py [--batch 8192] [--dim 16]
      [--tables 26] [--vocab 100000] [--inner-steps 20] [--repeats 3]
      [--model dcnv2] [--cpu N] [--json]
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import argparse
import json
import time


def main():
  p = argparse.ArgumentParser()
  p.add_argument('--batch', type=int, default=8192)
  p.add_argument('--dim', type=int, default=16)
  p.add_argument('--tables', type=int, default=26)
  p.add_argument('--dense-features', type=int, default=13)
  p.add_argument('--vocab', type=int, default=100_000)
  p.add_argument('--inner-steps', type=int, default=20)
  p.add_argument('--repeats', type=int, default=3)
  p.add_argument('--model', default='dcnv2', choices=['dcnv2', 'dlrm'])
  p.add_argument('--sparse', action='store_true',
                 help='stacked tables + row-sparse Adagrad '
                      '(no dense [V, D] gradients)')
  p.add_argument('--bf16', action='store_true',
                 help='bfloat16 matmul compute (params stay fp32)')
  p.add_argument('--no-dedup', action='store_true',
                 help='sparse mode: skip duplicate-id combining '
                      '(TF SparseApplyAdagrad semantics, no sort)')
  p.add_argument('--interleave', type=int, default=0, metavar='K',
                 help='sparse mode: PICASSO interleaving over K '
                      'micro-batches')
  p.add_argument('--table-dtype', default='float32',
                 choices=['float32', 'bfloat16'],
                 help='embedding table storage dtype (bfloat16 halves '
                      'table HBM and the update kernel stream bytes)')
  p.add_argument('--cpu', type=int, default=0)
  p.add_argument('--json', action='store_true')
  args = p.parse_args()

  if args.cpu:
    from hybridbackend_tpu.framework.platform import force_host_devices
    force_host_devices(args.cpu)
  import jax
  import jax.numpy as jnp
  import numpy as np
  import optax
  import hybridbackend_tpu as hb
  from hybridbackend_tpu.embedding import TableConfig
  from hybridbackend_tpu.models import (
      EmbeddingSpec, StackedFeatureExtractor, extract_features,
      init_tables, dlrm_apply, dlrm_init, stacked_dcn_v2_apply,
      stacked_dcn_v2_init)
  from hybridbackend_tpu.training import (
      SparseTrainState, TrainState, make_sparse_train_step,
      make_train_step, multi_optimizer)

  if args.bf16:
    hb.OPTIONS['compute_dtype'] = 'bfloat16'
  ctx = hb.Context.get()
  tdt = jnp.bfloat16 if args.table_dtype == 'bfloat16' else jnp.float32
  specs = [EmbeddingSpec(TableConfig(f'c{i}', args.vocab, args.dim,
                                     dtype=tdt))
           for i in range(args.tables)]
  dense_names = [f'i{d}' for d in range(args.dense_features)]
  key = jax.random.PRNGKey(0)
  k_tab, k_net = jax.random.split(key)
  if args.model == 'dcnv2':
    net = stacked_dcn_v2_init(
        k_net, [args.dim] * args.tables + [1] * args.dense_features,
        [1024, 512, 256, 1])
    apply_fn = stacked_dcn_v2_apply
  else:
    net = dlrm_init(k_net, args.dense_features, args.tables,
                    [512, 256], args.dim, [1024, 512, 1])
    apply_fn = dlrm_apply

  def preds_from(net_params, emb, dense):
    if args.model == 'dcnv2':
      return apply_fn(net_params, emb + dense)
    return apply_fn(net_params, dense, emb)

  def bce(preds, y):
    preds = jnp.clip(preds, 1e-6, 1 - 1e-6)
    return -jnp.mean(y * jnp.log(preds) + (1 - y) * jnp.log(1 - preds))

  if args.sparse:
    fx = StackedFeatureExtractor(specs, dense_columns=dense_names,
                                 ctx=ctx)
    tables = fx.init(k_tab)

    def model_loss(dense_params, emb_f, dense_f, batch):
      return bce(preds_from(dense_params, emb_f, dense_f),
                 batch['label']), {}

    state = SparseTrainState.create(net, tables, optax.adam(1e-3),
                                    adagrad_init=0.1, ctx=ctx)
    if args.interleave >= 1:
      from hybridbackend_tpu.pipeline import make_interleaved_train_step
      if args.no_dedup:
        raise SystemExit('--no-dedup is not supported with --interleave')
      step = make_interleaved_train_step(
          fx, model_loss, optax.adam(1e-3), args.interleave,
          table_lr=0.05, ctx=ctx, donate_state=False)
    else:
      step = make_sparse_train_step(fx, model_loss, optax.adam(1e-3),
                                    table_lr=0.05,
                                    table_dedup=not args.no_dedup,
                                    ctx=ctx, donate_state=False)
  else:
    tables = init_tables(specs, k_tab, ctx)
    params = {'tables': tables, 'net': net}

    def loss_fn(params, batch):
      emb, dense = extract_features(params['tables'], batch, specs,
                                    dense_names, ctx=ctx)
      return bce(preds_from(params['net'], emb, dense),
                 batch['label']), {}

    opt = multi_optimizer(optax.adagrad(0.05), optax.adam(1e-3))(params)
    state = TrainState.create(params, opt, ctx)
    step = make_train_step(loss_fn, opt, ctx)

  rng = np.random.RandomState(0)
  base = {
      **{s.name: jax.device_put(
          jnp.asarray(rng.randint(0, args.vocab, args.batch), jnp.int32),
          ctx.batch_sharding) for s in specs},
      **{d: jax.device_put(
          jnp.asarray(rng.rand(args.batch), jnp.float32),
          ctx.batch_sharding) for d in dense_names},
      'label': jax.device_put(
          jnp.asarray(rng.randint(0, 2, args.batch), jnp.float32),
          ctx.batch_sharding),
  }

  def multi_step(state, _):
    def body(carry, i):
      st = carry
      # Derive ids from the loop counter so the body depends on it and
      # cannot be hoisted/deduplicated by XLA.
      batch = dict(base)
      for s in specs:
        batch[s.name] = (base[s.name] + i) % args.vocab
      st, metrics = step(st, batch)
      return st, metrics['loss']
    return jax.lax.scan(body, state, jnp.arange(args.inner_steps))

  multi = jax.jit(multi_step)
  t_compile = time.perf_counter()
  state, losses = multi(state, 0)
  first_loss = float(losses[-1])  # forces execution
  compile_s = time.perf_counter() - t_compile

  times = []
  for _ in range(args.repeats):
    t0 = time.perf_counter()
    state, losses = multi(state, 0)
    _ = float(losses[-1])
    times.append(time.perf_counter() - t0)
  best = min(times)
  ms_per_step = 1000.0 * best / args.inner_steps
  examples_per_s = args.batch * args.inner_steps / best

  result = {
      'metric': 'train_examples_per_sec',
      'value': round(examples_per_s, 1),
      'unit': 'examples/s',
      'ms_per_step': round(ms_per_step, 3),
      'model': args.model,
      'sparse': args.sparse,
      'interleave': args.interleave,
      'bf16': args.bf16,
      'batch': args.batch,
      'tables': args.tables,
      'dim': args.dim,
      'devices': ctx.world_size,
      'backend': jax.default_backend(),
      'compile_s': round(compile_s, 1),
      'final_loss': round(first_loss, 4),
  }
  if args.json:
    print(json.dumps(result))
  else:
    for k, v in result.items():
      print(f'{k:>22}: {v}')


if __name__ == '__main__':
  main()
